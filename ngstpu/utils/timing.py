"""Stage timing with the reference's stderr conventions.

The reference prints `Finished at %.3f s` computed as elapsed_microseconds /
CLOCKS_PER_SEC (reference fastq_count.c:100-104,236) — on Linux
CLOCKS_PER_SEC == 1e6 so the figure is seconds. We reproduce the format, and
additionally expose structured per-stage timings for profiling.
"""

from __future__ import annotations

import sys
import time


import os


class StageTimer:
    def __init__(self):
        self.begin = time.monotonic()
        self.stages: list[tuple[str, float]] = []

    def elapsed(self) -> float:
        return time.monotonic() - self.begin

    def log(self, fmt: str = "Finished at %.3f s\n") -> None:
        sys.stderr.write(fmt % self.elapsed())
        if self.stages and os.environ.get("NGSTPU_PROFILE"):
            prev = 0.0
            parts = []
            for name, t in self.stages:
                parts.append(f"{name}={t - prev:.3f}s")
                prev = t
            sys.stderr.write("[profile] " + " ".join(parts) + "\n")

    def checkpoint(self, name: str) -> None:
        self.stages.append((name, self.elapsed()))
