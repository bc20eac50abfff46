#!/usr/bin/env python
"""Simulated-mesh scalebench driver with per-size retry (round-5 item 3).

XLA's CPU collective rendezvous can abort the whole process under this
box's load spikes, which round 4 could not re-run through. This driver
runs EACH mesh size as its own subprocess (8 virtual CPU devices) and
retries a crashed size with backoff, so one abort costs a retry instead
of the table. Writes the rows to .cache/bench/scalebench_sim.jsonl.

Usage: python scripts/scalebench_sim.py [--reads-per-chip N] [--tries K]
"""

from __future__ import annotations

import json
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]


def run_size(n: int, reads_per_chip: int, tries: int,
             base_qc: float | None) -> dict | None:
    env = {
        "NGSTPU_PLATFORM": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "JAX_PLATFORMS": "",
        "PYTHONPATH": str(REPO),
    }
    import os

    full_env = {**os.environ, **env}
    cmd = [sys.executable, "-m", "ngstpu.parallel.scalebench",
           "--sizes", str(n), "--reads-per-chip", str(reads_per_chip)]
    if base_qc is not None:
        cmd += ["--base-qc", str(base_qc)]
    for attempt in range(tries):
        r = subprocess.run(cmd, capture_output=True, timeout=1800,
                           cwd=str(REPO), env=full_env)
        if r.returncode == 0:
            lines = [ln for ln in r.stdout.decode().splitlines()
                     if ln.startswith("{")]
            if lines:
                return json.loads(lines[-1])
        sys.stderr.write(
            f"[scalebench_sim] n={n} attempt {attempt} failed "
            f"(rc={r.returncode}): {r.stderr.decode()[-200:]}\n")
        time.sleep(5 * (attempt + 1))
    return None


def main() -> int:
    reads_per_chip = 32768
    tries = 4
    args = iter(sys.argv[1:])
    for a in args:
        if a == "--reads-per-chip":
            reads_per_chip = int(next(args))
        elif a == "--tries":
            tries = int(next(args))
    out = REPO / ".cache" / "bench" / "scalebench_sim.jsonl"
    out.parent.mkdir(parents=True, exist_ok=True)
    rows = []
    base_qc = None
    for n in (1, 2, 4, 8):
        row = run_size(n, reads_per_chip, tries, base_qc)
        if row is None:
            sys.stderr.write(f"[scalebench_sim] n={n}: gave up\n")
            continue
        if n == 1:
            base_qc = row["qc_reads_per_s"]
        rows.append(row)
        print(json.dumps(row), flush=True)
    out.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    return 0 if rows else 1


if __name__ == "__main__":
    sys.exit(main())
