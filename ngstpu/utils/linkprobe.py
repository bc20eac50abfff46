"""Process-wide host<->device link bandwidth verdict.

The device kernels are always the default compute path; on a thin link
(tunneled/remote chip rather than PCIe/ICI) shipping big operands costs
more than host-side C++ compute. One ~8MB device_put is timed the first
time a placement-aware op sees a big operand; every such op then shares
the verdict. NGSTPU_LINK=host|device overrides; NGSTPU_QC_BW_MIN (MB/s,
default 1000) is the threshold: the native host paths these ops fall back
to (threaded qc histogram, pileup sweep) run at multiple GB/s even on a
2-core host, so shipping operands only wins on a co-located PCIe/ICI link.
"""

from __future__ import annotations

import os

import numpy as np

_VERDICT: list = []  # [] = unmeasured; ["host"|"device"]


def bw_min() -> float:
    return float(os.environ.get("NGSTPU_QC_BW_MIN", "1000")) * 1e6


def link_verdict() -> str | None:
    forced = os.environ.get("NGSTPU_LINK")
    if forced in ("host", "device"):
        return forced
    return _VERDICT[0] if _VERDICT else None


def note_transfer(nbytes: int, seconds: float) -> None:
    """Update the verdict from a REALIZED device transfer. The tunnel's
    throughput swings over time (measured 5MB/s..1.4GB/s between phases),
    so a single lucky probe can mis-place every later op; every big pull
    re-votes instead. Small transfers are RTT-dominated and ignored."""
    if os.environ.get("NGSTPU_LINK") in ("host", "device"):
        return
    if nbytes < (4 << 20) or seconds <= 0:
        return
    v = "host" if nbytes / seconds < bw_min() else "device"
    _VERDICT.clear()
    _VERDICT.append(v)


def probe_link(arr: np.ndarray) -> str:
    """Time an ~8MB device_put slice of `arr`; record and return verdict."""
    import time

    import jax

    v = link_verdict()
    if v is not None:
        return v
    flat = arr.reshape(-1)
    n = max(1, min(len(flat), (8 << 20) // max(flat.itemsize, 1)))
    probe = np.ascontiguousarray(flat[:n])
    t0 = time.monotonic()
    out = jax.device_put(probe)
    out.block_until_ready()
    # force the data round (block_until_ready can under-report through
    # remote-device tunnels): pull one element back
    _ = np.asarray(out[:1])
    dt = max(time.monotonic() - t0, 1e-9)
    _VERDICT.append("host" if probe.nbytes / dt < bw_min() else "device")
    return _VERDICT[0]
