"""Persistent hugepage-backed buffer pool.

This VM's anonymous-page fault path is pathologically slow and *variable*
(measured 25MB/s..8GB/s first-touch within one session), so any stage that
allocates a few hundred MB per run can eat seconds of pure fault time on a
bad draw. The pool mmaps each named buffer once, `madvise(MADV_HUGEPAGE)`s
it (512x fewer faults), pre-touches it at acquisition, and hands out numpy
views for the rest of the process — repeated pipeline runs (multi-lane
mode, the warm `serve` daemon, benchmarks) never fault again.

Plays the role the reference's whole-file malloc'd arrays play
(e.g. reference gzfastq_sort.c:243-249 preallocation), but process-wide.
"""

from __future__ import annotations

import mmap
import threading

import numpy as np

_lock = threading.Lock()
_pool: dict[str, tuple[mmap.mmap, int]] = {}


def _round_cap(nbytes: int) -> int:
    """Next power-of-two-ish capacity (1.0x/1.5x steps) >= 2MB."""
    cap = 2 << 20
    while cap < nbytes:
        if cap + (cap >> 1) >= nbytes:
            return cap + (cap >> 1)
        cap <<= 1
    return cap


def get_buffer(name: str, nbytes: int, dtype=np.uint8) -> np.ndarray:
    """A flat numpy view of `nbytes` bytes (element count derived from
    dtype) over the named pooled buffer, growing it if needed.

    Views of the same name alias each other — callers use distinct names
    per concurrently-live purpose. Contents are NOT zeroed on reuse.
    """
    nbytes = max(int(nbytes), 1)
    with _lock:
        ent = _pool.get(name)
        if ent is None or ent[1] < nbytes:
            if ent is not None:
                try:
                    ent[0].close()
                except BufferError:
                    pass  # live views keep it alive; GC reclaims later
            cap = _round_cap(nbytes)
            mm = mmap.mmap(-1, cap)
            if hasattr(mm, "madvise") and hasattr(mmap, "MADV_HUGEPAGE"):
                try:
                    mm.madvise(mmap.MADV_HUGEPAGE)
                except OSError:
                    pass
            # pre-touch once so the fault cost is paid here, not mid-stage —
            # but only up to a bound: a multi-GB request (e.g. sized from an
            # untrusted header field) must not turn into minutes of
            # synchronous page faults; beyond the bound the consumer pays
            # faults lazily for exactly the pages it writes
            import os as _os

            pretouch = int(_os.environ.get("NGSTPU_PRETOUCH_MAX", 1 << 30))
            np.frombuffer(mm, dtype=np.uint8)[:min(cap, pretouch):4096] = 0
            _pool[name] = (mm, cap)
            ent = _pool[name]
    itemsize = np.dtype(dtype).itemsize
    count = nbytes // itemsize
    return np.frombuffer(ent[0], dtype=dtype, count=count)


def get_matrix(name: str, rows: int, cols: int, dtype=np.uint8) -> np.ndarray:
    a = get_buffer(name, rows * cols * np.dtype(dtype).itemsize, dtype)
    return a.reshape(rows, cols)


def release(name: str) -> None:
    with _lock:
        ent = _pool.pop(name, None)
        if ent is not None:
            try:
                ent[0].close()
            except BufferError:
                pass
