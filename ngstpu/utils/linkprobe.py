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
    _store_verdict(v)


def _cache_ttl() -> float:
    """Verdict persistence window (seconds; NGSTPU_LINK_TTL overrides).

    Long by design (round-3 verdict item 5): a cold probe costs a full
    subprocess JAX init, so spaced CLI bursts must not re-pay it. The
    corrective for tunnel-phase drift inside the window is note_transfer:
    every realized ≥4MB device pull re-votes and refreshes the cache
    timestamp, so an active pipeline tracks the link continuously and
    only a fully idle gap ever serves a stale verdict."""
    return float(os.environ.get("NGSTPU_LINK_TTL", "900"))


def _cache_path():
    import pathlib

    return pathlib.Path.home() / ".cache" / "ngstpu" / "linkprobe.json"


def _backend() -> str:
    try:
        import jax

        return jax.devices()[0].platform
    except Exception:  # noqa: BLE001 - cache key only
        return "unknown"


def _cached_verdict() -> str | None:
    import json
    import time

    try:
        d = json.loads(_cache_path().read_text())
        # a verdict is only meaningful for the backend it was measured
        # on: a CPU-forced test run must never poison a TPU run (or vice
        # versa)
        ttl = _cache_ttl()
        if d["v"] == "device":
            # 'device' is the costly verdict to serve stale on this
            # tunnel (a dead phase stalls real transfers for minutes,
            # while a stale 'host' merely forgoes an upside), so it
            # expires on a third of the window (advisor r4)
            ttl = ttl / 3.0
        if time.time() - float(d["ts"]) < ttl \
                and d.get("backend") == _backend() \
                and d["v"] in ("host", "device"):
            return d["v"]
    except (OSError, ValueError, KeyError, TypeError):
        pass
    return None


def _store_verdict(v: str) -> None:
    import json
    import os
    import time

    try:
        p = _cache_path()
        p.parent.mkdir(parents=True, exist_ok=True)
        tmp = p.with_name(f".{os.getpid()}.linkprobe")
        tmp.write_text(json.dumps({"v": v, "ts": time.time(),
                                   "backend": _backend()}))
        os.replace(tmp, p)
    except OSError:
        pass


def _timed_put(probe: np.ndarray, deadline: float) -> float:
    """Seconds for a device round-trip of `probe.nbytes` zeros, or +inf
    if it misses `deadline` seconds — a dead tunnel phase can stall a
    device_put for MINUTES, so the probe must never block unboundedly.
    The put runs in a SUBPROCESS that the deadline kills: a thread stuck
    inside the C++ transfer cannot be cancelled and aborts the whole
    process at interpreter shutdown ('FATAL: exception not rethrown'),
    observed on the tunneled chip. The child warms the backend with a
    tiny put first so initialization is excluded from the measurement."""
    import subprocess
    import sys

    # pin the child to the PARENT'S resolved backend: the environment
    # default may differ (sitecustomize forces the tunnel; a parent that
    # reconfigured jax_platforms after import would otherwise store a
    # verdict measured on a backend it never uses under its own cache key)
    plat = _backend()
    pin = (f"jax.config.update('jax_platforms', {plat!r})\n"
           if plat != "unknown" else "")
    code = (
        "import time, numpy as np\n"
        "import jax\n"
        + pin +
        "jax.device_put(np.zeros(64, np.uint8)).block_until_ready()\n"
        f"y = np.zeros({int(probe.nbytes)}, np.uint8)\n"
        "t0 = time.monotonic()\n"
        "o = jax.device_put(y)\n"
        "o.block_until_ready()\n"
        "_ = np.asarray(o[:1])\n"  # force the data round through tunnels
        "print(time.monotonic() - t0)\n")
    try:
        p = subprocess.Popen([sys.executable, "-c", code],
                             stdout=subprocess.PIPE,
                             stderr=subprocess.DEVNULL)
        try:
            out, _ = p.communicate(timeout=deadline + 20.0)  # + init slack
        except subprocess.TimeoutExpired:
            p.kill()
            p.communicate()
            return float("inf")
        return max(float(out), 1e-9)
    except (OSError, ValueError):
        return float("inf")


def probe_link(arr: np.ndarray) -> str:
    """Staged link-bandwidth probe; records and returns the verdict.

    A 1MB put goes first: if even that runs below the threshold the
    verdict is host WITHOUT paying for the 8MB confirmation (on a dead
    tunnel phase the old single 8MB probe itself cost tens of seconds —
    exactly the condition it exists to detect). Only a fast-looking 1MB
    result (which small-transfer RTT can only UNDERestimate, so a slow
    link can never sneak past) is confirmed at 8MB. Verdicts from
    realized transfers persist to a short-TTL cache so CLI bursts in
    fresh processes skip the probe entirely."""
    v = link_verdict()
    if v is not None:
        return v
    if arr.nbytes < (8 << 20):
        # RTT-dominated operand: a timed put would under-measure any
        # link; shipping this little is cheap either way, so go device
        # WITHOUT recording a verdict (mirrors ops/count's size gate)
        return "device"
    v = _cached_verdict()
    if v is not None:
        _VERDICT.append(v)
        return v
    flat = arr.reshape(-1)
    n1 = max(1, min(len(flat), (1 << 20) // max(flat.itemsize, 1)))
    small = np.ascontiguousarray(flat[:n1])
    # deadline = generous multiple of the threshold-rate transfer time
    # (+ tunnel-establishment slack); a link that can't move 1MB in this
    # window can't win any placement decision either
    dt = _timed_put(small, deadline=max(16 * small.nbytes / bw_min(), 10.0))
    if small.nbytes / dt < bw_min():
        v = "host"
    else:
        n8 = max(1, min(len(flat), (8 << 20) // max(flat.itemsize, 1)))
        probe = np.ascontiguousarray(flat[:n8])
        dt = _timed_put(probe, deadline=max(8 * probe.nbytes / bw_min(),
                                            5.0))
        v = "host" if probe.nbytes / dt < bw_min() else "device"
    _VERDICT.append(v)
    _store_verdict(v)
    return v
