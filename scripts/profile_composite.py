#!/usr/bin/env python
"""Fine-grained profile of the composite fast path (dev tool).

Mirrors tools/pipeline.run_fast stage by stage with inline timers so the
real cost centers are visible (the StageTimer checkpoints lump them).
"""
from __future__ import annotations

import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

from ngstpu.utils.jaxsetup import setup_jax_cache

setup_jax_cache()
import jax
import jax.numpy as jnp

N_READS = int(os.environ.get("NGSTPU_BENCH_READS", 1 << 21))
READ_LEN = 100
TRIM_END = 50


def fixture() -> pathlib.Path:
    d = REPO / ".cache" / "bench"
    d.mkdir(parents=True, exist_ok=True)
    p = d / f"comp_{N_READS}x{READ_LEN}.fq"
    if not p.exists():
        from ngstpu.testing.fixtures import random_fastq_fast
        p.write_bytes(random_fastq_fast(N_READS, READ_LEN, seed=123,
                                        dup_frac=0.3))
    return p


def profile_once(path, prefix):
    from ngstpu.io.fastindex import (fused_stats, index_fastq, trim_text,
                                     uniq_text)
    from ngstpu.ops.sortengine import rep_counts_host, sort_partition
    from ngstpu.tools.pipeline import (_CloningSink, _partition_bounds,
                                       _RingWriter, CHUNK_RECORDS, N_PARTS)
    from ngstpu.utils.bufpool import get_buffer, get_matrix

    T = {}
    t_all = time.monotonic()

    t0 = time.monotonic()
    ix = index_fastq(str(path))
    T["index"] = time.monotonic() - t0

    B = ix.n
    lmax = int(ix.seq_len.max())
    W = max(1, -(-lmax // 16))
    words_all = get_matrix("pipe.words", B, W, np.uint32)
    sumq_all = get_buffer("pipe.sumq", 4 * B, np.uint32)
    hist_q = np.zeros((512, 128), np.uint64)
    hist_len = np.zeros(512, np.uint64)
    bucket = np.zeros(256, np.uint32)

    start, end = 0, TRIM_END
    cl = np.clip(np.minimum(ix.seq_len.astype(np.int64), end) - start, 0,
                 None)
    trim_rec = ix.name_len.astype(np.int64) + 1 + cl + 3 + cl + 1
    chunk_trim_cap = 1
    for lo in range(0, B, CHUNK_RECORDS):
        chunk_trim_cap = max(chunk_trim_cap,
                             int(trim_rec[lo:lo + CHUNK_RECORDS].sum()))

    t_fused = t_trim = t_submit = 0.0
    with open(prefix + ".trim.fastq", "wb") as tf:
        writer = _RingWriter(tf, ["pipe.trim0", "pipe.trim1", "pipe.trim2"])
        try:
            for lo in range(0, B, CHUNK_RECORDS):
                hi = min(lo + CHUNK_RECORDS, B)
                t0 = time.monotonic()
                ok = fused_stats(ix, lo, hi, W, words_all[lo:hi],
                                 sumq_all[lo:hi], hist_q, hist_len, bucket)
                t_fused += time.monotonic() - t0
                t0 = time.monotonic()
                name = writer.acquire()
                buf = get_buffer(name, chunk_trim_cap)
                total = trim_text(ix, lo, hi, start, end, buf)
                t_trim += time.monotonic() - t0
                t0 = time.monotonic()
                writer.submit(name, buf, total)
                t_submit += time.monotonic() - t0
        finally:
            t0 = time.monotonic()
            writer.close()
            T["trim_close"] = time.monotonic() - t0
    T["fused_stats"] = t_fused
    T["trim_fmt"] = t_trim
    T["trim_submit"] = t_submit

    from ngstpu.ops.count import QCAccumulator
    from ngstpu.tools.fastq_count import _row
    t0 = time.monotonic()
    acc = QCAccumulator.from_host_partials(hist_q, hist_len)
    with open(prefix + ".count.tsv", "w") as out:
        out.write(_row(str(path), acc))
    T["count_row"] = time.monotonic() - t0

    const_len = int(ix.seq_len.min()) == lmax
    # device placement, mirrors _sort_device
    t0 = time.monotonic()
    bounds = _partition_bounds(bucket, N_PARTS)
    top = words_all[:, 0] >> np.uint32(24)
    part = np.searchsorted(bounds, top, side="right")
    T["part_classify"] = time.monotonic() - t0

    handles = []
    t_gather = t_h2d = t_dispatch = 0.0
    for p in range(N_PARTS):
        t0 = time.monotonic()
        idx_p = np.flatnonzero(part == p).astype(np.int64)
        n_p = len(idx_p)
        cap = -(-n_p // (256 << 10)) * (256 << 10)
        stage = get_matrix(f"pipe.stage{p}", cap, W, np.uint32)
        np.take(words_all, idx_p, axis=0, out=stage[:n_p])
        if cap > n_p:
            stage[n_p:] = 0
        t_gather += time.monotonic() - t0
        t0 = time.monotonic()
        w_dev = jnp.asarray(stage)
        l_dev = jnp.zeros((cap,), jnp.int32)
        t_h2d += time.monotonic() - t0
        t0 = time.monotonic()
        perm, is_head = sort_partition(w_dev, l_dev, jnp.int32(n_p),
                                       length_key=not const_len,
                                       maybe_padding=cap > n_p)
        t_dispatch += time.monotonic() - t0
        handles.append((perm, is_head, idx_p, n_p))
    T["part_gather"] = t_gather
    T["part_h2d"] = t_h2d
    T["part_sortdispatch"] = t_dispatch

    t_pull = t_rep = t_fmt = t_sub = 0.0
    uniq_path = prefix + "_uniq.fq"
    n_groups = 0
    with open(uniq_path, "wb", buffering=0) as uf, \
            open(prefix + "_sortKeyUniq.fq", "wb", buffering=0) as cf:
        writer = _RingWriter(_CloningSink(uf, cf), ["pipe.emit0",
                                                    "pipe.emit1"])
        try:
            for k, (perm_d, is_head_d, idx_p, n_p) in enumerate(handles):
                t0 = time.monotonic()
                perm = np.asarray(perm_d)[:n_p]
                is_head = np.asarray(is_head_d)[:n_p]
                t_pull += time.monotonic() - t0
                t0 = time.monotonic()
                rep_local, counts = rep_counts_host(perm, is_head, n_p,
                                                    sumq_all[idx_p])
                rep = idx_p[rep_local]
                t_rep += time.monotonic() - t0
                n_groups += len(rep)
                t0 = time.monotonic()
                name = writer.acquire()
                view, total = uniq_text(ix, rep, counts, name)
                t_fmt += time.monotonic() - t0
                t0 = time.monotonic()
                writer.submit(name, view, total)
                t_sub += time.monotonic() - t0
        finally:
            t0 = time.monotonic()
            writer.close()
            T["emit_close"] = time.monotonic() - t0
    T["emit_pull"] = t_pull
    T["emit_repcounts"] = t_rep
    T["emit_fmt"] = t_fmt
    T["emit_submit"] = t_sub
    T["TOTAL"] = time.monotonic() - t_all
    T["n_groups"] = n_groups
    return T


def main():
    path = fixture()
    work = REPO / ".cache" / "bench" / "work"
    work.mkdir(parents=True, exist_ok=True)
    prefix = str(work / "prof")
    for r in range(int(os.environ.get("ROUNDS", "3"))):
        T = profile_once(path, prefix)
        print(f"--- round {r} total={T.pop('TOTAL'):.3f}s "
              f"groups={T.pop('n_groups')}")
        for k, v in T.items():
            if v >= 0.005:
                print(f"  {k:18s} {v:7.3f}s")


if __name__ == "__main__":
    main()
