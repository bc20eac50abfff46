#!/usr/bin/env python
"""Fine-grained substage profile of the pipeline fast path (dev tool).

Replicates tools/pipeline.run_fast with a timer around every substage so
perf work can see past the three coarse checkpoints. Not part of the test
surface. Usage: python scripts/prof_fast.py [reads]
"""
from __future__ import annotations

import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

N_READS = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 21
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


class T:
    def __init__(self):
        self.t0 = time.monotonic()
        self.last = self.t0
        self.rows = []

    def tick(self, name):
        now = time.monotonic()
        self.rows.append((name, now - self.last))
        self.last = now

    def dump(self):
        tot = time.monotonic() - self.t0
        for n, d in self.rows:
            print(f"  {n:<28s} {d*1000:9.1f} ms")
        print(f"  {'TOTAL':<28s} {tot*1000:9.1f} ms")


def run_once(path, prefix, verbose=True):
    import jax.numpy as jnp
    from ngstpu.io.fastindex import (fused_stats, index_fastq, trim_text,
                                     uniq_text)
    from ngstpu.ops.count import QCAccumulator
    from ngstpu.ops.sortengine import rep_counts_host
    from ngstpu.tools.fastq_count import _row
    from ngstpu.tools.pipeline import (CHUNK_RECORDS, N_PARTS, _CloningSink,
                                       _RingWriter, _partition_bounds)
    from ngstpu.utils.bufpool import get_buffer, get_matrix
    from ngstpu.utils.linkprobe import link_verdict, probe_link

    t = T()
    ix = index_fastq(str(path))
    t.tick("index_fastq")

    B = ix.n
    lmax = int(ix.seq_len.max())
    W = max(1, -(-lmax // 16))
    words_all = get_matrix("pipe.words", B, W, np.uint32)
    sumq_all = get_buffer("pipe.sumq", 4 * B, np.uint32)
    hist_q = np.zeros((512, 128), np.uint64)
    hist_len = np.zeros(512, np.uint64)
    bucket = np.zeros(256, np.uint32)
    t.tick("alloc")

    cl = np.clip(np.minimum(ix.seq_len.astype(np.int64), TRIM_END) - 0, 0,
                 None)
    trim_rec = ix.name_len.astype(np.int64) + 1 + cl + 3 + cl + 1
    chunk_trim_cap = 1
    for lo in range(0, B, CHUNK_RECORDS):
        chunk_trim_cap = max(chunk_trim_cap,
                             int(trim_rec[lo:lo + CHUNK_RECORDS].sum()))
    fused_s = trim_s = acq_s = 0.0
    with open(prefix + ".trim.fastq", "wb") as tf:
        writer = _RingWriter(tf, ["pipe.trim0", "pipe.trim1", "pipe.trim2"])
        try:
            for lo in range(0, B, CHUNK_RECORDS):
                hi = min(lo + CHUNK_RECORDS, B)
                a = time.monotonic()
                ok = fused_stats(ix, lo, hi, W, words_all[lo:hi],
                                 sumq_all[lo:hi], hist_q, hist_len, bucket)
                b = time.monotonic(); fused_s += b - a
                name = writer.acquire()
                c = time.monotonic(); acq_s += c - b
                buf = get_buffer(name, chunk_trim_cap)
                total = trim_text(ix, lo, hi, 0, TRIM_END, buf)
                d = time.monotonic(); trim_s += d - c
                writer.submit(name, buf, total)
        finally:
            a = time.monotonic()
            writer.close()
            t.rows.append(("  writer drain", time.monotonic() - a))
    t.rows.append(("  fused_stats", fused_s))
    t.rows.append(("  trim_text", trim_s))
    t.rows.append(("  ring acquire wait", acq_s))
    t.tick("parse+trim total")

    acc = QCAccumulator.from_host_partials(hist_q, hist_len)
    with open(prefix + ".count.tsv", "w") as out:
        out.write(_row(str(path), acc))
    t.tick("count row")

    const_len = int(ix.seq_len.min()) == lmax
    verdict = link_verdict()
    if verdict is None:
        verdict = probe_link(words_all)
    t.tick(f"link probe ({verdict})")

    if verdict == "host":
        import ctypes
        from ngstpu.io.native import get_lib
        lib = get_lib()
        perm = np.empty(B, np.int32)
        is_head = np.empty(B, np.uint8)
        lens = np.ascontiguousarray(ix.seq_len, np.int32)
        lib.ngs_dedup_sort_host(
            words_all, lens.ctypes.data_as(ctypes.c_void_p),
            0 if const_len else 1, B, W, perm, is_head, 0)
        t.tick("host sort")
        rep, counts = rep_counts_host(perm, is_head.view(bool), B, sumq_all)
        t.tick("rep_counts")
        groups = [(rep, counts)]
    else:
        from ngstpu.ops.sortengine import sort_partition
        bounds = _partition_bounds(bucket, N_PARTS)
        top = words_all[:, 0] >> np.uint32(24)
        part = np.searchsorted(bounds, top, side="right")
        t.tick("partition assign")
        handles = []
        for p in range(N_PARTS):
            idx_p = np.flatnonzero(part == p).astype(np.int64)
            n_p = len(idx_p)
            if n_p == 0:
                continue
            cap = -(-n_p // (256 << 10)) * (256 << 10)
            stage = get_matrix(f"pipe.stage{p}", cap, W, np.uint32)
            np.take(words_all, idx_p, axis=0, out=stage[:n_p])
            if cap > n_p:
                stage[n_p:] = 0
            w_dev = jnp.asarray(stage)
            l_dev = jnp.zeros((cap,), jnp.int32) if const_len else None
            perm_d, head_d = sort_partition(w_dev, l_dev, jnp.int32(n_p),
                                            length_key=not const_len,
                                            maybe_padding=cap > n_p)
            handles.append((perm_d, head_d, idx_p, n_p))
        t.tick("device dispatch (4 parts)")
        groups = []
        pull_s = grp_s = 0.0
        for perm_d, head_d, idx_p, n_p in handles:
            a = time.monotonic()
            perm = np.asarray(perm_d)[:n_p]
            is_head = np.asarray(head_d)[:n_p]
            b = time.monotonic(); pull_s += b - a
            rep_local, counts = rep_counts_host(perm, is_head, n_p,
                                                sumq_all[idx_p])
            groups.append((idx_p[rep_local], counts))
            grp_s += time.monotonic() - b
        t.rows.append(("  device pull", pull_s))
        t.rows.append(("  rep_counts", grp_s))
        t.tick("device sort total")

    fmt_s = 0.0
    with open(prefix + "_uniq.fq", "wb", buffering=0) as uf, \
            open(prefix + "_sortKeyUniq.fq", "wb", buffering=0) as cf:
        writer = _RingWriter(_CloningSink(uf, cf), ["pipe.emit0",
                                                    "pipe.emit1"])
        try:
            for rep, counts in groups:
                if len(rep) == 0:
                    continue
                a = time.monotonic()
                name = writer.acquire()
                view, total = uniq_text(ix, rep, counts, name)
                fmt_s += time.monotonic() - a
                writer.submit(name, view, total)
        finally:
            a = time.monotonic()
            writer.close()
            t.rows.append(("  emit writer drain", time.monotonic() - a))
    t.rows.append(("  uniq_text(+acquire)", fmt_s))
    t.tick("uniq emit total")
    if verbose:
        t.dump()
    return time.monotonic() - t.t0


def main():
    from ngstpu.utils.jaxsetup import setup_jax_cache
    setup_jax_cache()
    path = fixture()
    work = REPO / ".cache" / "bench" / "profwork"
    work.mkdir(parents=True, exist_ok=True)
    prefix = str(work / "p")
    print(f"reads={N_READS} file={path.stat().st_size/1e6:.0f} MB")
    for i in range(3):
        print(f"--- run {i} ---")
        dt = run_once(path, prefix, verbose=True)
        print(f"run {i}: {dt:.3f}s  ({N_READS/dt:,.0f} r/s)")


if __name__ == "__main__":
    main()
