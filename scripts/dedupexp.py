#!/usr/bin/env python
"""Device dedup-sort experiments on the real chip (round-4 item 6).

Times (min-of-N, scalar-pull sync) at the scalebench shape
(2M x 128bp -> 2-bit words W=8, const lens):
  a) dedup_sorted           — the scalebench metric today (W+len+sumq passes)
  b) sort_partition x16     — MSD-partitioned device sorts (production
                              _sort_device_async shape): per-sort n is 16x
                              smaller, and the sumq pass is gone (host
                              rep/count recovery)
  c) sort_partition 1-shot  — same kernel, unpartitioned (isolates the
                              partitioning win from the dropped sumq pass)

Usage: python scripts/dedupexp.py [B_log2] [parts]
"""
from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from ngstpu.utils.jaxsetup import setup_jax_cache  # noqa: E402

setup_jax_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ngstpu.ops.sortengine import dedup_sorted, sort_partition  # noqa: E402


def sync(x) -> None:
    float(jnp.sum(x.astype(jnp.float32)))  # scalar pull forces the tunnel


def main() -> None:
    blog = int(sys.argv[1]) if len(sys.argv) > 1 else 21
    parts = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    B, W = 1 << blog, 8
    rng = np.random.default_rng(0)
    words_h = rng.integers(0, 1 << 32, (B, W), dtype=np.uint64) \
        .astype(np.uint32)
    lens_h = np.full(B, 118, np.int32)
    sumq_h = rng.integers(0, 4000, B).astype(np.uint32)
    print(f"platform={jax.devices()[0].platform} B={B} W={W} parts={parts}",
          flush=True)

    wd = jnp.asarray(words_h)
    ld = jnp.asarray(lens_h)
    qd = jnp.asarray(sumq_h)

    # a) current scalebench metric
    res = dedup_sorted(wd, ld, qd, jnp.int32(B), maybe_padding=False)
    sync(res["perm"])
    best = 1e9
    for _ in range(3):
        t0 = time.monotonic()
        res = dedup_sorted(wd, ld, qd, jnp.int32(B), maybe_padding=False)
        sync(res["perm"])
        best = min(best, time.monotonic() - t0)
    print(f"a) dedup_sorted:      {best:.3f}s  {B/best/1e6:.2f}M rows/s",
          flush=True)

    # c) sort_partition, unpartitioned (drops the sumq pass; host recovery)
    sp = sort_partition(wd, ld, jnp.int32(B), length_key=False,
                        maybe_padding=False)
    sync(sp[0])
    best = 1e9
    for _ in range(3):
        t0 = time.monotonic()
        sp = sort_partition(wd, ld, jnp.int32(B), length_key=False,
                            maybe_padding=False)
        sync(sp[0])
        best = min(best, time.monotonic() - t0)
    print(f"c) sort_partition 1x: {best:.3f}s  {B/best/1e6:.2f}M rows/s",
          flush=True)

    # b) MSD partition by top bits into `parts` equal slices (uniform keys
    # here, so host partitioning is a cheap stable bucket; production does
    # this off the leading-byte histogram). Device arrays are pre-staged
    # per part; timing covers dispatch of ALL parts then one sync each —
    # the async-pipeline shape of _sort_device_async.
    top = words_h[:, 0] >> np.uint32(32 - int(np.log2(parts)))
    order = np.argsort(top, kind="stable")
    bounds = np.searchsorted(top[order], np.arange(parts + 1))
    n_p = [int(bounds[p + 1] - bounds[p]) for p in range(parts)]
    # ONE padded shape for every partition (production rounds to 256k
    # multiples for the same reason): a single compile serves all 16
    cap = -(-max(n_p) // (64 << 10)) * (64 << 10)
    slices = []
    for p in range(parts):
        sl = order[bounds[p]:bounds[p + 1]]
        stage = np.zeros((cap, W), np.uint32)
        stage[:len(sl)] = words_h[sl]
        slices.append(jnp.asarray(stage))
    lcap = jnp.asarray(np.full(cap, 118, np.int32))
    outs = [sort_partition(s, lcap, jnp.int32(n), length_key=False,
                           maybe_padding=True)
            for s, n in zip(slices, n_p)]  # warm: one shape, one compile
    for o in outs:
        sync(o[0])
    best = 1e9
    for _ in range(3):
        t0 = time.monotonic()
        outs = [sort_partition(s, lcap, jnp.int32(n), length_key=False,
                               maybe_padding=True)
                for s, n in zip(slices, n_p)]
        for o in outs:
            sync(o[0])
        best = min(best, time.monotonic() - t0)
    print(f"b) partitioned x{parts}: {best:.3f}s  {B/best/1e6:.2f}M rows/s"
          f"  (cap {cap}, part sizes {min(n_p)}..{max(n_p)})", flush=True)


if __name__ == "__main__":
    main()
