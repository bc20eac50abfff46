"""ctypes loader for the native host-I/O library (ngsio.cpp).

Compiles on first use with g++ -O3 -march=native into ngstpu/native/build/.
Every entry point has a pure-numpy fallback, so the framework degrades
gracefully on machines without a toolchain (NGSTPU_NO_NATIVE=1 forces the
fallback for testing).
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading

import numpy as np

_NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent / "native"
_BUILD_DIR = _NATIVE_DIR / "build"
_SRC = _NATIVE_DIR / "ngsio.cpp"
_SO = _BUILD_DIR / "libngsio.so"

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False

_i64 = ctypes.c_int64
_i32 = ctypes.c_int32
_int = ctypes.c_int
_p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")


def _build() -> bool:
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    # build to a per-pid temp path, then atomic-rename: concurrent builders
    # never observe a half-written .so
    tmp = _BUILD_DIR / f".libngsio.{os.getpid()}.so"
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-o", str(tmp), str(_SRC), "-lz", "-lpthread"]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=180)
        if r.returncode != 0 or not tmp.exists():
            return False
        os.replace(tmp, _SO)
        return True
    except (OSError, subprocess.TimeoutExpired):
        try:
            tmp.unlink(missing_ok=True)
        except OSError:
            pass
        return False


def get_lib() -> ctypes.CDLL | None:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("NGSTPU_NO_NATIVE"):
            return None
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            return None
        lib.ngs_version.restype = _int
        lib.ngs_count_newlines.restype = _i64
        lib.ngs_count_newlines.argtypes = [_p_u8, _i64, _int]
        lib.ngs_find_newlines.restype = _i64
        lib.ngs_find_newlines.argtypes = [_p_u8, _i64, _p_i64, _int]
        lib.ngs_fill_padded.argtypes = [_p_u8, _p_i64, _p_i32, _i64, _i64,
                                        _p_u8, _int]
        lib.ngs_concat_ragged.argtypes = [_p_u8, _p_i64, _p_i32, _p_i64, _i64,
                                          _p_u8, _int]
        lib.ngs_scatter_rows.argtypes = [_p_u8, _p_i32, _i64, _i64, _p_i64,
                                         _p_u8, _int]
        lib.ngs_concat_pairs.argtypes = [_p_u8, _p_i32, _i64, _p_u8, _p_i32,
                                         _i64, _i64, _i64, _p_u8, _int]
        lib.ngs_format_fastq.argtypes = [
            _p_u8, _p_i64, _p_i32,              # names
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # suffixes
            _p_u8, _p_u8, _p_i32, ctypes.c_void_p,  # seq, qual, lens, qual_lens
            _i64, _i64, _p_i64, _p_u8, _int]
        lib.ngs_gzip_compress_blocks.restype = _int
        lib.ngs_gzip_compress_blocks.argtypes = [
            _p_u8, _p_i64, _p_i64, _i64, _p_u8, _p_i64, _p_i64, _p_i64,
            _int, _int]
        lib.ngs_gzip_decompress_blocks.restype = _int
        lib.ngs_gzip_decompress_blocks.argtypes = [
            _p_u8, _p_i64, _p_i64, _i64, _p_u8, _p_i64, _p_i64, _p_i64, _int]
        lib.ngs_mrle_encode_rows.restype = _i64
        lib.ngs_mrle_encode_rows.argtypes = [_p_u8, _p_i32, _i64, _i64,
                                             _p_u8, _p_i32]
        lib.ngs_dna3_pack.argtypes = [
            _p_u8, _i64, _i64, _i64,
            np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"), _int]
        lib.ngs_row_sums_u32.argtypes = [
            _p_u8, _i64, _i64,
            np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"), _int]
        lib.ngs_bam_count.restype = _int
        lib.ngs_bam_count.argtypes = [_p_u8, _i64, ctypes.POINTER(_i64),
                                      ctypes.POINTER(_i64)]
        lib.ngs_bam_scan.argtypes = [
            _p_u8, _i64, _p_i64, _p_i32, _p_i32, _p_i32, _p_i32, _p_i32,
            _p_i32, _p_i32, _p_i64, _p_i32, _p_u8,
            np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS"), _int]
        lib.ngs_format_int3_rows.restype = _i64
        lib.ngs_format_int3_rows.argtypes = [_p_u8, _i32, _p_i64, _p_i64,
                                             _p_i64, _i64, _p_u8]
        lib.ngs_format_int2_fixed2_rows.restype = _i64
        lib.ngs_format_int2_fixed2_rows.argtypes = [_p_u8, _i32, _p_i64,
                                                    _p_i64, _p_i64, _i64, _p_u8]
        _lib = lib
        return _lib


def have_native() -> bool:
    return get_lib() is not None


def find_newlines(data: np.ndarray) -> np.ndarray:
    """Offsets of all newlines in a uint8 array (native or numpy)."""
    lib = get_lib()
    if lib is None:
        return np.flatnonzero(data == 0x0A).astype(np.int64)
    n = lib.ngs_count_newlines(data, len(data), 0)
    out = np.empty(n, dtype=np.int64)
    if n:
        lib.ngs_find_newlines(data, len(data), out, 0)
    return out


def fill_padded(data: np.ndarray, starts: np.ndarray, lens: np.ndarray,
                lmax: int) -> np.ndarray:
    """Padded row gather (native memcpy path or numpy fallback)."""
    lib = get_lib()
    b = len(starts)
    if lib is None:
        from .ragged import gather_padded
        return gather_padded(data, starts, lens, lmax)
    out = np.empty((b, lmax), dtype=np.uint8)
    if b:
        lib.ngs_fill_padded(data, np.ascontiguousarray(starts, np.int64),
                            np.ascontiguousarray(lens, np.int32),
                            b, lmax, out, 0)
    return out


def format_int3_rows(prefix: bytes, a: np.ndarray, b: np.ndarray,
                     c: np.ndarray) -> bytes:
    """Rows "prefix\\tA\\tB\\tC\\n" (int columns), native itoa fast path."""
    n = len(a)
    if n == 0:
        return b""
    lib = get_lib()
    a64 = np.ascontiguousarray(a, np.int64)
    b64 = np.ascontiguousarray(b, np.int64)
    c64 = np.ascontiguousarray(c, np.int64)
    if lib is None:
        return b"".join(prefix + b"\t%d\t%d\t%d\n" % t
                        for t in zip(a64.tolist(), b64.tolist(), c64.tolist()))
    cap = n * (len(prefix) + 64)
    out = np.empty(cap, dtype=np.uint8)
    w = lib.ngs_format_int3_rows(np.frombuffer(prefix, np.uint8), len(prefix),
                                 a64, b64, c64, n, out)
    return out[:w].tobytes()


def concat_pairs(a: np.ndarray, la: np.ndarray, b: np.ndarray,
                 lb: np.ndarray, lmax_out: int) -> np.ndarray:
    """Row-wise out[i] = a[i][:la[i]] ++ b[i][:lb[i]], zero-padded."""
    lib = get_lib()
    n = len(la)
    if lib is None:
        out = np.zeros((n, lmax_out), dtype=np.uint8)
        for i in range(n):  # fallback only
            l1, l2 = int(la[i]), int(lb[i])
            out[i, :l1] = a[i, :l1]
            out[i, l1:l1 + l2] = b[i, :l2]
        return out
    out = np.empty((n, lmax_out), dtype=np.uint8)
    if n:
        lib.ngs_concat_pairs(np.ascontiguousarray(a),
                             np.ascontiguousarray(la, np.int32), a.shape[1],
                             np.ascontiguousarray(b),
                             np.ascontiguousarray(lb, np.int32), b.shape[1],
                             n, lmax_out, out, 0)
    return out


def concat_ragged(data: np.ndarray, starts: np.ndarray,
                  lens: np.ndarray) -> np.ndarray:
    lib = get_lib()
    lens64 = lens.astype(np.int64)
    out_starts = np.zeros(len(starts), dtype=np.int64)
    if len(starts):
        np.cumsum(lens64[:-1], out=out_starts[1:])
    total = int(lens64.sum())
    if lib is None:
        from .ragged import ragged_arange
        src = np.repeat(starts.astype(np.int64), lens64) + ragged_arange(lens64)
        return data[src]
    out = np.empty(total, dtype=np.uint8)
    if len(starts):
        lib.ngs_concat_ragged(data, np.ascontiguousarray(starts, np.int64),
                              np.ascontiguousarray(lens, np.int32),
                              out_starts, len(starts), out, 0)
    return out
