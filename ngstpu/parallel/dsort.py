"""Distributed dedup/sort over the 'dp' mesh axis.

The global dedup problem (gzfastq_uniq at 10M+ reads, SURVEY.md §7 "global
dedup at scale") sharded across chips:

1. every shard owns a row slice of the packed key matrix;
2. rows route to the shard that owns their key's hash bucket via
   jax.lax.all_to_all (equal keys share a hash, so every duplicate group
   lands whole on one shard — global ORDER is not needed for grouping);
3. each shard runs the local LSD dedup on what it received;
4. heads/counts are already exact; the host k-way-merges the per-shard
   key-sorted head lists when a globally sorted output is required.

Bucket capacity is provisioned at pad_factor x fair share; overflowing
rows would be dropped silently by the scatter, so the kernel also returns
per-shard received counts for the caller to validate (a production run
would re-shard with a bigger factor on overflow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

FNV_OFFSET = np.uint32(2166136261)
FNV_PRIME = np.uint32(16777619)


def _hash_rows(words: jax.Array, lens: jax.Array) -> jax.Array:
    """FNV-1a over the key words + length, vectorized. uint32 [b]."""
    h = jnp.full(words.shape[:1], FNV_OFFSET, jnp.uint32)
    W = words.shape[1]
    for w in range(W):
        for shift in (0, 8, 16, 24):
            byte = (words[:, w] >> shift) & 0xFF
            h = (h ^ byte.astype(jnp.uint32)) * FNV_PRIME
    h = (h ^ lens.astype(jnp.uint32)) * FNV_PRIME
    return h


def exchange_by_hash(mesh: Mesh, pad_factor: float = 2.0):
    """Build a jitted fn: (words [B,W], lens [B], sumq [B], valid [B]) ->
    (r_words, r_lens, r_sumq, r_valid) with rows re-sharded by key hash.

    Shapes stay static: each shard sends exactly `cap` rows per peer
    (invalid filler rows carry valid=False).
    """
    n_dp = mesh.devices.size

    def local(words, lens, sumq, valid):
        b, W = words.shape
        cap = int(pad_factor * b / n_dp) + 8
        h = _hash_rows(words, lens)
        bucket = (h % n_dp).astype(jnp.int32)
        bucket = jnp.where(valid, bucket, n_dp)  # invalid -> no bucket

        # stable sort rows by bucket so each peer's rows are contiguous
        idx = jax.lax.broadcasted_iota(jnp.int32, (b,), 0)
        _, order = jax.lax.sort((bucket, idx), num_keys=1, is_stable=True)
        s_bucket = jnp.take(bucket, order)
        # position within bucket
        pos = idx - jnp.searchsorted(s_bucket, s_bucket, side="left")
        ok = (pos < cap) & (s_bucket < n_dp)
        # send buffer [n_dp, cap, ...]
        dest = jnp.where(ok, s_bucket * cap + pos, n_dp * cap)

        def scatter(x, fill):
            flat = jnp.full((n_dp * cap + 1,) + x.shape[1:], fill, x.dtype)
            flat = flat.at[dest].set(jnp.take(x, order, axis=0))
            return flat[:-1].reshape((n_dp, cap) + x.shape[1:])

        sw = scatter(words, 0)
        sl = scatter(lens, 0)
        sq = scatter(sumq, 0)
        sv = scatter(valid.astype(jnp.int32), 0)

        rw = jax.lax.all_to_all(sw, "dp", 0, 0, tiled=False)
        rl = jax.lax.all_to_all(sl, "dp", 0, 0, tiled=False)
        rq = jax.lax.all_to_all(sq, "dp", 0, 0, tiled=False)
        rv = jax.lax.all_to_all(sv, "dp", 0, 0, tiled=False)
        m = n_dp * cap
        return (rw.reshape((m,) + words.shape[1:]), rl.reshape(m),
                rq.reshape(m), rv.reshape(m) == 1)

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P("dp", None), P("dp"), P("dp"), P("dp")),
                   out_specs=(P("dp", None), P("dp"), P("dp"), P("dp")))
    return jax.jit(fn)


def distributed_dedup(mesh: Mesh, words: np.ndarray, lens: np.ndarray,
                      sumq: np.ndarray, pad_factor: float = 2.0):
    """Full-array entry: shard, exchange, local dedup per shard.

    Returns (rep_indices, counts) as host arrays (key-sorted within each
    hash shard, then merged by key on host for global order). Row indices
    refer to positions in the RESHUFFLED arrays, so callers needing
    original indices pass an index column through sumq-style side arrays;
    here we return keys+counts for verification/use by stats consumers.
    """
    from ..ops.sortengine import dedup_groups

    n_dp = mesh.devices.size
    B = words.shape[0]
    pad = (-B) % n_dp
    if pad:
        words = np.pad(words, ((0, pad), (0, 0)))
        lens = np.pad(lens, (0, pad))
        sumq = np.pad(sumq, (0, pad))
    valid = np.arange(len(lens)) < B

    ex = exchange_by_hash(mesh, pad_factor)
    with mesh:
        args = [jax.device_put(a, NamedSharding(mesh, P("dp", *([None] * (a.ndim - 1)))))
                for a in (words, lens.astype(np.int32),
                          sumq.astype(np.uint32), valid)]
        rw, rl, rq, rv = ex(*args)
        rw, rl, rq, rv = (np.asarray(rw), np.asarray(rl), np.asarray(rq),
                          np.asarray(rv))

    # received row count sanity (overflow detection)
    if int(rv.sum()) != B:
        raise RuntimeError(
            f"bucket overflow: received {int(rv.sum())} of {B} rows — "
            f"increase pad_factor")

    # local dedup per shard slice
    per = rw.shape[0] // n_dp
    out_keys, out_counts, out_lens = [], [], []
    for d in range(n_dp):
        sl = slice(d * per, (d + 1) * per)
        v = rv[sl]
        order = np.argsort(~v, kind="stable")  # valid rows first
        wd, ld, qd = rw[sl][order], rl[sl][order], rq[sl][order]
        nv = int(v.sum())
        if nv == 0:
            continue
        g = dedup_groups(jnp.asarray(wd), jnp.asarray(ld), jnp.asarray(qd),
                         nv, length_first=False)
        heads_sorted = g["perm"][g["head_pos"]]
        out_keys.append(wd[heads_sorted])
        out_lens.append(ld[heads_sorted])
        out_counts.append(g["counts"])
    if not out_keys:
        return (np.zeros((0, words.shape[1]), words.dtype),
                np.zeros(0, np.int32), np.zeros(0, np.int64))
    keys = np.concatenate(out_keys)
    klens = np.concatenate(out_lens)
    counts = np.concatenate(out_counts)
    # global key order: host lexsort over (words..., len)
    order = np.lexsort(tuple([klens] + [keys[:, w]
                                        for w in range(keys.shape[1] - 1, -1, -1)]))
    return keys[order], klens[order], counts[order]
