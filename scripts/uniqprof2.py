"""Replicates tools/gzfastq_uniq._run_se_fast exactly, with per-phase
wall/CPU accounting to locate the system-time sink the end-to-end run
shows. Usage: python scripts/uniqprof2.py FIXTURE OUT_PREFIX [nocfr]
"""

import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cpu_now():
    r = resource.getrusage(resource.RUSAGE_SELF)
    return r.ru_utime, r.ru_stime


def main():
    fixture, out_prefix = sys.argv[1], sys.argv[2]
    from ngstpu.io.fastindex import index_fastq_fused, uniq_text
    from ngstpu.tools.pipeline import (_CloningSink, _RingWriter, _fresh,
                                       _sort_host_async)
    from ngstpu.io.stream import with_suffix

    def snap(tag, t0, u0, s0):
        u1, s1 = cpu_now()
        print(f"  {tag}: wall={time.monotonic()-t0:.2f}s "
              f"usr={u1-u0:.2f}s sys={s1-s0:.2f}s", flush=True)

    t0 = time.monotonic(); u0, s0 = cpu_now()
    fused = index_fastq_fused(fixture, pool="pipe")
    ix, words, sumq, _hq, _hl, bucket, ok = fused
    assert ok
    snap("index_pack", t0, u0, s0)

    t0 = time.monotonic(); u0, s0 = cpu_now()
    const_len = int(ix.seq_len.min()) == int(ix.seq_len.max())
    gen = _sort_host_async(words, ix.seq_len, sumq, const_len)
    t_fmt = t_acq = t_sub = 0.0
    n_groups = 0
    first = True
    with open(_fresh(with_suffix(out_prefix, "_uniq.fq")), "wb",
              buffering=0) as f1, \
            open(_fresh(with_suffix(out_prefix, "_sortKeyUniq.fq")), "wb",
                 buffering=0) as f2:
        sink = _CloningSink(f1, f2)
        if len(sys.argv) > 3 and sys.argv[3] == "nocfr":
            sink._cfr = False
        writer = _RingWriter(sink, ["pipe.emit0", "pipe.emit1"])
        try:
            for rep, counts in gen:
                if first:
                    snap("sort_join", t0, u0, s0)
                    t0 = time.monotonic(); u0, s0 = cpu_now()
                    first = False
                n_groups += len(rep)
                ta = time.monotonic()
                name = writer.acquire()
                tb = time.monotonic()
                view, total = uniq_text(ix, rep, counts, name)
                tc = time.monotonic()
                writer.submit(name, view, total)
                td = time.monotonic()
                t_acq += tb - ta; t_fmt += tc - tb; t_sub += td - tc
        finally:
            writer.close()
    snap("emit+write", t0, u0, s0)
    print(f"  acquire={t_acq:.2f}s format={t_fmt:.2f}s submit={t_sub:.2f}s"
          f" groups={n_groups}")


if __name__ == "__main__":
    main()
