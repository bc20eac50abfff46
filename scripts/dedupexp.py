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


if __name__ == "__main__" and not (len(sys.argv) > 1
                                    and sys.argv[1] == "placement10m"):
    main()
    sys.exit(0)


def placement_10m() -> None:
    """Round-5 item: the 10M-read placement question as a RECORDED
    measurement (not an assumption). Times the full device dedup path at
    BASELINE config 3's shape — 10M x 100bp -> 2-bit words W=7 (~280MB
    host->device through the tunnel) + device LSD sort + perm/is_head
    pull + host rep/count recovery — against the native host engine
    (ngs_dedup_groups_host) on the SAME key matrix (the bench fixture's
    real packed keys when present, synthetic otherwise). Writes
    .cache/bench/dedupexp_10m.json. Usage:
    python scripts/dedupexp.py placement10m
    """
    import ctypes
    import json
    import resource

    from ngstpu.io.native import get_lib
    from ngstpu.ops.sortengine import rep_counts_host

    fixture = REPO / ".cache" / "bench" / "big_10000000x100.fq"
    out_path = REPO / ".cache" / "bench" / "dedupexp_10m.json"
    if fixture.exists():
        from ngstpu.io.fastindex import index_fastq_fused

        fused = index_fastq_fused(str(fixture), pool="dex", want_hist=False)
        ix, words_h, sumq_h, _hq, _hl, _bucket, ok = fused
        assert ok
        words_h = np.ascontiguousarray(words_h)
        lens_h = np.ascontiguousarray(ix.seq_len, np.int32)
        sumq_h = np.ascontiguousarray(sumq_h)
        src = "bench fixture (real keys)"
    else:
        rng = np.random.default_rng(0)
        words_h = rng.integers(0, 1 << 32, (10_000_000, 7),
                               dtype=np.uint64).astype(np.uint32)
        lens_h = np.full(10_000_000, 100, np.int32)
        sumq_h = rng.integers(0, 4000, 10_000_000).astype(np.uint32)
        src = "synthetic uniform keys"
    B, W = words_h.shape
    lib = get_lib()
    perm = np.empty(B, np.int32)
    rep = np.empty(B, np.int64)
    counts = np.empty(B, np.int64)

    def cpu():
        r = resource.getrusage(resource.RUSAGE_SELF)
        return r.ru_utime + r.ru_stime

    host_best = 1e9
    for _ in range(3):
        t0 = time.monotonic()
        g = lib.ngs_dedup_groups_host(
            words_h, lens_h.ctypes.data_as(ctypes.c_void_p), sumq_h,
            0, B, W, perm, rep, counts, 0)
        host_best = min(host_best, time.monotonic() - t0)
    print(f"host ngs_dedup_groups_host: {host_best:.2f}s "
          f"({B/host_best/1e6:.2f}M rows/s, {g} groups)", flush=True)

    # measured link bandwidth on exactly this operand
    t0 = time.monotonic()
    wd = jax.device_put(words_h)
    wd.block_until_ready()
    _ = np.asarray(wd[:1])
    xfer = time.monotonic() - t0
    bw = words_h.nbytes / xfer / 1e6
    print(f"transfer {words_h.nbytes >> 20}MB: {xfer:.2f}s = {bw:.0f}MB/s",
          flush=True)

    from ngstpu.ops.sortengine import sort_partition

    ld = jnp.asarray(lens_h)
    dev_best = 1e9
    for _ in range(2):
        t0 = time.monotonic()
        wd = jax.device_put(words_h)
        p_d, h_d = sort_partition(wd, ld, jnp.int32(B), length_key=False,
                                  maybe_padding=False)
        p_h = np.asarray(p_d)
        h_h = np.asarray(h_d)
        rep_l, cnts = rep_counts_host(p_h, h_h.view(bool), B, sumq_h)
        dev_best = min(dev_best, time.monotonic() - t0)
    print(f"device path end-to-end: {dev_best:.2f}s "
          f"({B/dev_best/1e6:.2f}M rows/s, {len(rep_l)} groups)", flush=True)
    payload = {
        "B": B, "W": W, "source": src,
        "platform": jax.devices()[0].platform,
        "host_seconds": round(host_best, 3),
        "device_seconds_end_to_end": round(dev_best, 3),
        "transfer_seconds": round(xfer, 3),
        "transfer_mb_per_s": round(bw, 1),
        "verdict": "host" if host_best <= dev_best else "device",
    }
    out_path.write_text(json.dumps(payload, indent=1))
    print(json.dumps(payload))


if __name__ == "__main__" and len(sys.argv) > 1 \
        and sys.argv[1] == "placement10m":
    placement_10m()
    sys.exit(0)
