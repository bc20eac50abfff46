"""Stage-isolated profile of the SE dedup fast path at scale.

Runs exactly the stages of tools/gzfastq_uniq._run_se_fast on a given
fixture, timing each in isolation (no overlap) so the core-seconds of
index/pack, sort+group, emit-format and file write are individually
attributable. Usage: python scripts/uniqprof.py FIXTURE [OUT_PREFIX]
"""

import ctypes
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def cpu_now():
    r = resource.getrusage(resource.RUSAGE_SELF)
    return r.ru_utime + r.ru_stime


def main():
    fixture = sys.argv[1]
    out_prefix = sys.argv[2] if len(sys.argv) > 2 else "/tmp/uniqprof"
    from ngstpu.io.fastindex import index_fastq_fused, uniq_text
    from ngstpu.io.native import get_lib

    stages = {}

    def mark(name, t0, c0):
        stages[name] = (time.monotonic() - t0, cpu_now() - c0)
        print(f"  {name}: wall={stages[name][0]:.2f}s cpu={stages[name][1]:.2f}s",
              flush=True)

    t0, c0 = time.monotonic(), cpu_now()
    fused = index_fastq_fused(fixture, pool="pipe")
    ix, words, sumq, _hq, _hl, bucket, ok = fused
    assert ok
    B = ix.n
    W = words.shape[1]
    mark("index_pack", t0, c0)

    lib = get_lib()
    perm = np.empty(B, np.int32)
    rep = np.empty(B, np.int64)
    counts = np.empty(B, np.int64)
    lens = np.ascontiguousarray(ix.seq_len, np.int32)
    const_len = int(ix.seq_len.min()) == int(ix.seq_len.max())
    t0, c0 = time.monotonic(), cpu_now()
    g = lib.ngs_dedup_groups_host(
        words, lens.ctypes.data_as(ctypes.c_void_p), sumq,
        0 if const_len else 1, B, W, perm, rep, counts, 0)
    mark("sort_group", t0, c0)
    print(f"  B={B} W={W} groups={g}")

    # emit: format text (uniq_text) separately from file write
    t0, c0 = time.monotonic(), cpu_now()
    step = 1 << 19
    views = []
    total_bytes = 0
    for lo in range(0, g, step):
        hi = min(lo + step, g)
        view, total = uniq_text(ix, rep[lo:hi], counts[lo:hi],
                                f"prof.emit{(lo // step) % 64}")
        views.append((view[:total].copy(), total))
        total_bytes += total
    mark("emit_format", t0, c0)
    print(f"  emit bytes={total_bytes}")

    t0, c0 = time.monotonic(), cpu_now()
    with open(out_prefix + "_uniq.fq", "wb") as f1, \
            open(out_prefix + "_sortKeyUniq.fq", "wb") as f2:
        for view, total in views:
            f1.write(view)
            f2.write(view)
    mark("write_2x", t0, c0)

    wall = sum(v[0] for v in stages.values())
    cpu = sum(v[1] for v in stages.values())
    print(f"TOTAL wall={wall:.2f}s cpu={cpu:.2f}s")


if __name__ == "__main__":
    main()
