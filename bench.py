#!/usr/bin/env python
"""ngstpu headline benchmark.

Measures the fastq_count pipeline (BASELINE.json config 1 scaled up:
fixed-length uncompressed FASTQ) end-to-end — host parse + device QC
histograms — in reads/sec on the real TPU, against the single-core C
reference tool compiled from /root/reference (BASELINE.md: baseline must be
measured, target >=10x per chip).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
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

N_READS = int(os.environ.get("NGSTPU_BENCH_READS", 1_000_000))
READ_LEN = 100


def ensure_fixture() -> pathlib.Path:
    d = REPO / ".cache" / "bench"
    d.mkdir(parents=True, exist_ok=True)
    p = d / f"bench_{N_READS}x{READ_LEN}.fq"
    if not p.exists():
        from ngstpu.testing.fixtures import random_fastq_fast
        p.write_bytes(random_fastq_fast(N_READS, READ_LEN, seed=123))
    return p


def time_c_reference(path: pathlib.Path) -> float | None:
    """Single-core C fastq_count wall seconds (best of 2)."""
    from ngstpu.testing.oracles import build_oracle
    exe = build_oracle("fastq_count")
    if exe is None:
        return None
    best = None
    for _ in range(2):
        t0 = time.monotonic()
        r = subprocess.run([exe, str(path)], capture_output=True, timeout=1800)
        dt = time.monotonic() - t0
        if r.returncode != 0:
            return None
        best = dt if best is None else min(best, dt)
    return best


def time_ngstpu(path: pathlib.Path) -> tuple[float, str]:
    from ngstpu.utils.jaxsetup import setup_jax_cache
    setup_jax_cache()
    import jax
    from ngstpu.tools.fastq_count import count_file

    plat = jax.devices()[0].platform
    count_file(str(path))  # warmup: compiles + caches
    best = None
    for _ in range(2):
        t0 = time.monotonic()
        count_file(str(path))
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return best, plat


def main() -> None:
    path = ensure_fixture()
    c_secs = time_c_reference(path)
    ours_secs, plat = time_ngstpu(path)
    rps = N_READS / ours_secs
    vs = (c_secs / ours_secs) if c_secs else 0.0
    sys.stderr.write(
        f"[bench] platform={plat} reads={N_READS} len={READ_LEN} "
        f"ours={ours_secs:.3f}s ({rps:,.0f} reads/s) "
        f"C_ref={c_secs:.3f}s speedup={vs:.2f}x\n" if c_secs else
        f"[bench] platform={plat} ours={ours_secs:.3f}s no C baseline\n")
    print(json.dumps({
        "metric": "fastq_count_reads_per_sec",
        "value": round(rps, 1),
        "unit": "reads/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
