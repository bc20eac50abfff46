"""Batch-shape bucketing so jit recompiles stay rare.

XLA compiles one program per distinct shape; FASTQ chunks produce varying
batch sizes. We pad the batch (row) dimension up to a small set of bucket
sizes and pass `n_valid` so kernels mask out padding rows.
"""

from __future__ import annotations

import numpy as np

MIN_BUCKET = 1024


def bucket_rows(n: int) -> int:
    """Next power-of-two bucket ≥ n (min 1024)."""
    b = MIN_BUCKET
    while b < n:
        b <<= 1
    return b


def pad_rows(arr: np.ndarray, bucket: int) -> np.ndarray:
    n = arr.shape[0]
    if n == bucket:
        return arr
    pad = [(0, bucket - n)] + [(0, 0)] * (arr.ndim - 1)
    return np.pad(arr, pad)
