"""Device sort/dedup engine — replaces the reference's hash tables and qsort.

The reference dedups with a Redis dict keyed by the exact sequence bytes
(reference gzfastq_uniq.c:194-281) and sorts whole files with qsort on
length-first comparators (reference gzfastq_sort.c:85-103). The TPU-native
formulation: pack row bytes into big-endian uint32 words so lexicographic
byte order == lexicographic word-tuple order, then one stable multi-operand
lax.sort; duplicate groups are equal-neighbor segments of the sorted order,
counts are segment sums, and the kept representative (highest quality sum,
earliest occurrence on ties — gzfastq_uniq.c:226 uses strict >) is a
segment max over a packed (sumQ, reverse-index) score.

Collation notes:
- plain lexicographic (sdscmp, gzfastq_uniq.c:142-144 / dump_dict:287-289):
  zero padding sorts shorter-prefix rows first, matching sdscmp's
  shorter-is-smaller tie rule, provided sequences contain no 0x00 bytes.
- length-first (gzfastq_sort.c comp_seq/comp_name): prepend the length as
  the most significant key operand.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def bytes_to_words(padded: jax.Array) -> jax.Array:
    """[B, L] uint8 (L % 4 == 0) -> [B, L//4] uint32 big-endian words."""
    B, L = padded.shape
    w = padded.astype(jnp.uint32).reshape(B, L // 4, 4)
    return (w[..., 0] << 24) | (w[..., 1] << 16) | (w[..., 2] << 8) | w[..., 3]


# DNA alphabet rank codes for 3-bit packing: 0 reserved for padding so
# shorter-prefix rows sort first; ranks follow ASCII order of the bytes
# ('.' < A < C < G < N < T) so packed-word order == byte-lex order.
_DNA3_RANK = np.zeros(256, dtype=np.uint8)
for _i, _c in enumerate(b".ACGNT"):
    _DNA3_RANK[_c] = _i + 1
DNA3_ALPHABET = frozenset(b".ACGNT")


def seq_words(padded_np: np.ndarray) -> jax.Array:
    """Collation-preserving sort words for sequence bytes: 3-bit packed
    (3.3x narrower keys) when the data is plain DNA, raw bytes otherwise."""
    dev = jnp.asarray(padded_np)
    if is_dna3_compatible(padded_np, None):
        return dna3_words(dev)
    return bytes_to_words(dev)


def is_dna3_compatible(padded: np.ndarray, lens: np.ndarray) -> bool:
    """True if all valid bytes are in the 6-char DNA alphabet (host check)."""
    present = np.bincount(padded.reshape(-1), minlength=256) > 0
    ok = np.zeros(256, dtype=bool)
    ok[0] = True
    for c in DNA3_ALPHABET:
        ok[c] = True
    return bool((~present | ok).all())


def dna3_words(padded: jax.Array) -> jax.Array:
    """[B, L] uint8 DNA -> [B, ceil(L/10)] uint32: ten 3-bit ranks per word.

    3.3x narrower sort keys than raw bytes with identical collation on the
    {., A, C, G, N, T} alphabet (caller must verify via is_dna3_compatible).
    """
    B, L = padded.shape
    ranks = jnp.zeros(padded.shape, jnp.uint32)
    for i, c in enumerate(b".ACGNT"):
        ranks = jnp.where(padded == c, jnp.uint32(i + 1), ranks)
    groups = (L + 9) // 10
    pad = groups * 10 - L
    if pad:
        ranks = jnp.pad(ranks, ((0, 0), (0, pad)))
    ranks = ranks.reshape(B, groups, 10)
    shifts = jnp.arange(27, -3, -3, dtype=jnp.uint32)
    return jnp.sum(ranks << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def _lsd_perm(keys_msf: list[jax.Array]) -> jax.Array:
    """Stable lexicographic argsort via LSD passes of 2-operand sorts.

    keys_msf: key arrays in most-significant-first order. A wide
    multi-operand lax.sort compiles pathologically on TPU (the comparator
    explodes); a chain of stable (key, perm) sorts — least significant key
    first — compiles linearly and runs at ~7M rows/s for 15 passes.
    Stability makes the original index the implicit final tiebreaker.
    """
    B = keys_msf[0].shape[0]
    perm = jax.lax.broadcasted_iota(jnp.int32, (B,), 0)
    for key in reversed(keys_msf):
        k = jnp.take(key, perm)
        _, perm = jax.lax.sort((k, perm), num_keys=1, is_stable=True)
    return perm


@functools.partial(jax.jit, static_argnames=("length_first",))
def lex_argsort(words: jax.Array, lens: jax.Array,
                length_first: bool = False) -> jax.Array:
    """Stable argsort of rows by word-tuple lexicographic order.

    words: uint32 [B, W]; lens: int32 [B] (used as the leading key when
    length_first). Returns perm int32 [B].
    """
    B, W = words.shape
    ops = []
    if length_first:
        ops.append(lens)
    ops.extend([words[:, w] for w in range(W)])
    return _lsd_perm(ops)


@functools.partial(jax.jit, static_argnames=("length_first",))
def dedup_sorted(words: jax.Array, lens: jax.Array, sumq: jax.Array,
                 n_valid: jax.Array, length_first: bool = False):
    """Sort rows and compute duplicate-group structure in one jitted pass.

    Padding rows (index >= n_valid) are forced to sort last via a sentinel
    length key and are excluded from groups.

    Returns dict of device arrays, all [B]:
      perm        sorted order (original row indices; padding rows last)
      is_head     True at the first row of each equal-sequence group
      group_count occurrences of this row's group (valid at heads)
      rep_idx     original index of the kept representative (valid at heads)
      n_groups    scalar: number of distinct sequences
    """
    B, W = words.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (B,), 0)
    valid = idx < n_valid

    # Sort keys (most significant first): [padding-last sentinel,
    # (len if length_first), words..., len, -sumQ]; stability supplies the
    # original-index tiebreak. Within an equal-sequence group rows land in
    # (sumQ desc, original idx asc) order, so each group's FIRST sorted row
    # IS the representative the reference keeps (strict > replacement,
    # gzfastq_uniq.c:226) — no 64-bit score packing needed.
    ops: list[jax.Array] = [(~valid).astype(jnp.uint32)]
    if length_first:
        ops.append(lens)
    ops.extend([words[:, w] for w in range(W)])
    ops.append(lens)
    ops.append(-sumq.astype(jnp.int32))
    perm = _lsd_perm(ops)

    s_words = jnp.take(words, perm, axis=0)
    s_lens = jnp.take(lens, perm)
    s_valid = jnp.take(valid, perm)

    same = jnp.all(s_words[1:] == s_words[:-1], axis=1) & \
        (s_lens[1:] == s_lens[:-1]) & s_valid[1:] & s_valid[:-1]
    is_head = jnp.concatenate([jnp.ones((1,), bool), ~same]) & s_valid

    group_id = jnp.cumsum(is_head.astype(jnp.int32)) - 1   # [B]
    group_id = jnp.where(s_valid, group_id, B - 1)

    ones = s_valid.astype(jnp.int32)
    group_count = jax.ops.segment_sum(ones, group_id, num_segments=B)

    # head position of each group -> representative original index
    pos = jax.lax.broadcasted_iota(jnp.int32, (B,), 0)
    head_pos = jax.ops.segment_min(jnp.where(s_valid, pos, B - 1), group_id,
                                   num_segments=B)
    rep_by_group = jnp.take(perm, jnp.clip(head_pos, 0, B - 1))

    n_groups = jnp.sum(is_head.astype(jnp.int32))
    return dict(perm=perm, is_head=is_head,
                group_count=jnp.take(group_count, group_id),
                rep_idx=jnp.take(rep_by_group, group_id),
                n_groups=n_groups, group_id=group_id)


@jax.jit
def sum_quality(qual: jax.Array, lens: jax.Array) -> jax.Array:
    """Per-read sum of quality bytes over valid cycles
    (reference gzfastq_uniq.c:49-55 SUMQuality)."""
    B, L = qual.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    mask = col < lens[:, None]
    return jnp.sum(jnp.where(mask, qual.astype(jnp.uint32), 0), axis=1)


def np_lex_argsort(padded: np.ndarray, lens: np.ndarray,
                   length_first: bool = False) -> np.ndarray:
    """numpy oracle for tests (stable)."""
    keys = [padded[:, i] for i in range(padded.shape[1] - 1, -1, -1)]
    if length_first:
        keys = keys + [lens]
    return np.lexsort(keys)
