"""Batched Smith-Waterman local alignment scoring on TPU.

The reference vendors klib's SSE2 striped Smith-Waterman (klib/ksw.{h,c},
SURVEY.md §1 "library headroom" — unused by the CLI tools but part of the
intended capability envelope). The TPU formulation: affine-gap
Gotoh DP vectorized over a BATCH of read/target pairs — lax.scan walks
query positions while [B, Lt] H/E/F lanes update on the VPU, so throughput
scales with batch width instead of SSE lanes.

Scoring: match/mismatch constants (a, -b) like ksw_sse2's common use, gap
open/extend (q, r) with affine semantics  E = max(H - q - r, E - r).
Returns the maximum local score per pair (ksw's `score`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG = -10_000


@functools.partial(jax.jit, static_argnames=("match", "mismatch", "gap_open",
                                             "gap_extend"))
def sw_score_batch(query: jax.Array, qlens: jax.Array, target: jax.Array,
                   tlens: jax.Array, match: int = 1, mismatch: int = 3,
                   gap_open: int = 5, gap_extend: int = 2) -> jax.Array:
    """query uint8 [B, Lq], target uint8 [B, Lt] (zero-padded) -> int32 [B].

    Local (Smith-Waterman) score with affine gaps; padding positions are
    masked out of the recurrence.
    """
    B, Lq = query.shape
    _, Lt = target.shape
    tcol = jax.lax.broadcasted_iota(jnp.int32, (B, Lt), 1)
    tmask = tcol < tlens[:, None]

    def row(carry, qi):
        H_prev, E, best = carry          # all [B, Lt]
        qbase, qpos = qi                 # [B], [B]
        active = (qpos < qlens)[:, None]
        sub = jnp.where(target == qbase[:, None], match, -mismatch)
        sub = jnp.where(tmask, sub, NEG)
        # H_diag for column j is H_prev[j-1]; column 0 diag is 0 (fresh start)
        H_diag = jnp.pad(H_prev[:, :-1], ((0, 0), (1, 0)))
        E = jnp.maximum(H_prev - gap_open - gap_extend, E - gap_extend)
        h_open = jnp.maximum(H_diag + sub, 0)
        h_with_e = jnp.maximum(h_open, E)

        # F (gap in target) needs a prefix-scan along the row:
        # F[j] = max_k<=j (h_with_e_without_F[k] - gap_open - (j-k)*gap_ext)
        # computed as a running max via associative scan on shifted values.
        g = h_with_e - gap_open
        idx = jnp.arange(Lt)
        shifted = g + idx[None, :] * (-gap_extend) * (-1)  # g + j*ge
        run = jax.lax.associative_scan(jnp.maximum, shifted, axis=1)
        F = jnp.pad((run - idx[None, :] * gap_extend)[:, :-1] - gap_extend,
                    ((0, 0), (1, 0)), constant_values=NEG)
        H = jnp.maximum(h_with_e, F)
        H = jnp.where(active & tmask, H, 0)
        best = jnp.maximum(best, jnp.max(H, axis=1))
        return (H, jnp.where(active, E, NEG), best), None

    H0 = jnp.zeros((B, Lt), jnp.int32)
    E0 = jnp.full((B, Lt), NEG, jnp.int32)
    best0 = jnp.zeros((B,), jnp.int32)
    qpos = jnp.arange(Lq, dtype=jnp.int32)
    (H, E, best), _ = jax.lax.scan(
        row, (H0, E0, best0),
        (query.T.astype(jnp.int32), jnp.broadcast_to(qpos[:, None], (Lq, B))))
    return best


def sw_score_numpy(q: bytes, t: bytes, match=1, mismatch=3, gap_open=5,
                   gap_extend=2) -> int:
    """Reference DP oracle (O(Lq*Lt) scalar)."""
    Lq, Lt = len(q), len(t)
    H = np.zeros((Lq + 1, Lt + 1), dtype=np.int64)
    E = np.full((Lq + 1, Lt + 1), NEG, dtype=np.int64)
    F = np.full((Lq + 1, Lt + 1), NEG, dtype=np.int64)
    best = 0
    for i in range(1, Lq + 1):
        for j in range(1, Lt + 1):
            E[i, j] = max(H[i - 1, j] - gap_open - gap_extend,
                          E[i - 1, j] - gap_extend)
            F[i, j] = max(H[i, j - 1] - gap_open - gap_extend,
                          F[i, j - 1] - gap_extend)
            s = match if q[i - 1] == t[j - 1] else -mismatch
            H[i, j] = max(0, H[i - 1, j - 1] + s, E[i, j], F[i, j])
            best = max(best, H[i, j])
    return int(best)
