"""Persistent hugepage-backed buffer pool.

This VM's anonymous-page fault path is pathologically slow and *variable*
(measured 25MB/s..8GB/s first-touch within one session), so any stage that
allocates a few hundred MB per run can eat seconds of pure fault time on a
bad draw. The pool mmaps each named buffer once, `madvise(MADV_HUGEPAGE)`s
it (512x fewer faults), pre-touches it at acquisition, and hands out numpy
views for the rest of the process — repeated pipeline runs (multi-lane
mode, the warm `serve` daemon, benchmarks) never fault again.

When /dev/shm is usable the buffers are additionally backed by tmpfs
files that OUTLIVE the process (NGSTPU_SHM_POOL=0 opts out): a fresh CLI
invocation re-maps the previous run's still-resident pages instead of
re-paying the first-touch allocation wall (~0.1s/512MB warm vs seconds
on a bad phase — measured on this box). One process at a time owns the
on-disk pool via a flock; concurrent runs fall back to private anonymous
maps. Contents are never preserved across runs (same contract as
same-process reuse: callers treat acquired buffers as uninitialized).

Plays the role the reference's whole-file malloc'd arrays play
(e.g. reference gzfastq_sort.c:243-249 preallocation), but process-wide.
"""

from __future__ import annotations

import mmap
import os
import threading

import numpy as np

_lock = threading.Lock()
_pool: dict[str, tuple[mmap.mmap, int]] = {}

# shm state: None = undecided, "" = disabled/fallback, else the pool dir
_shm_dir: str | None = None
_shm_lock_fd: int = -1
_SHM_BUDGET = int(float(os.environ.get("NGSTPU_SHM_POOL_MAX_GB", "12"))
                  * (1 << 30))


def _shm_init() -> str:
    """Acquire process-exclusive ownership of the on-tmpfs pool directory;
    returns the directory path or "" when unavailable/contended."""
    global _shm_lock_fd
    if os.environ.get("NGSTPU_SHM_POOL", "1") == "0":
        return ""
    base = os.environ.get("NGSTPU_SHM_POOL_DIR",
                          f"/dev/shm/ngstpu-pool-{os.geteuid()}")
    try:
        import fcntl

        os.makedirs(base, mode=0o700, exist_ok=True)
        fd = os.open(os.path.join(base, ".lock"),
                     os.O_RDWR | os.O_CREAT | os.O_CLOEXEC, 0o600)
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            os.close(fd)
            return ""  # another live process owns the pool
        _shm_lock_fd = fd
        return base
    except OSError:
        return ""


def _shm_used(d: str) -> int:
    try:
        with os.scandir(d) as it:
            return sum(e.stat().st_size for e in it if e.is_file())
    except OSError:
        return 0


def _shm_map(name: str, cap: int) -> mmap.mmap | None:
    """A MAP_SHARED mapping of the named tmpfs-backed pool file grown to
    `cap` bytes, or None (caller falls back to anonymous memory).
    Called with `_lock` already held by get_buffer."""
    global _shm_dir
    if _shm_dir is None:
        _shm_dir = _shm_init()
    if not _shm_dir:
        return None
    safe = "".join(c if c.isalnum() or c in "._-" else "_" for c in name)
    path = os.path.join(_shm_dir, safe + ".buf")
    try:
        try:
            cur = os.stat(path).st_size
        except FileNotFoundError:
            cur = 0
        if cur < cap:
            # budget-gate growth only: remapping an existing >=cap file is
            # free, and an oversized request must not evict warm siblings
            if _shm_used(_shm_dir) - cur + cap > _SHM_BUDGET:
                return None
        fd = os.open(path, os.O_RDWR | os.O_CREAT | os.O_CLOEXEC, 0o600)
    except OSError:
        return None
    try:
        if os.fstat(fd).st_size < cap:
            os.ftruncate(fd, cap)
        return mmap.mmap(fd, cap)
    except (OSError, ValueError):
        return None
    finally:
        os.close(fd)


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
            mm = _shm_map(name, cap)
            if mm is None:
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
            # faults lazily for exactly the pages it writes. (Warm shm
            # pages only minor-fault here — that is the cross-run win.)
            pretouch = int(os.environ.get("NGSTPU_PRETOUCH_MAX", 1 << 30))
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
