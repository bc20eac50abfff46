"""QC counting kernels: per-cycle quality histogram + read-length histogram.

Reimplements the hot loop of the reference `fastq_count` family
(reference fastq_count.c:106-133 `count_read` / `AssignQuality`,
fastq_count_kthread.c:126-147) as a TPU reduction: instead of scalar
`Quality[q][cycle]++` increments, each batch computes a fused
compare-and-reduce over [B, L, NQ] (XLA fuses the one-hot compare into the
sum, so nothing is materialized) yielding the [cycle, qual] count matrix on
the MXU/VPU. Host code accumulates per-batch int32 partials into an int64
[128, 512] matrix matching the C layout.

Parity notes (SURVEY.md §7 quirks register):
- Q20/Q30 thresholds are raw ASCII >=53 / >=63 (Phred+33 20/30)
  per reference fastq_count.c:124.
- Histogram capacity is 128 quality values x 512 cycles, length histogram
  512 bins (reference fastq_count.c:110-111); longer reads are undefined
  behavior in the C code — we clip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

N_QUAL = 128
N_CYCLE = 512
Q20_ASCII = 53
Q30_ASCII = 63


@functools.partial(jax.jit, static_argnames=("n_qual", "n_len"))
def qc_histograms(qual: jax.Array, lens: jax.Array, n_valid: jax.Array,
                  n_qual: int = N_QUAL, n_len: int = N_CYCLE):
    """Per-batch QC histograms.

    qual: uint8 [B, L]; lens: int32 [B]; n_valid: scalar int32 (rows < n_valid
    are real records, the rest are shape padding).

    Returns (cycle_hist int32 [L, n_qual], len_hist int32 [n_len]).
    cycle_hist[c, q] = number of reads whose quality byte at cycle c equals q.
    """
    B, L = qual.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (B, L), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
    rowmask = row < n_valid                       # [B, 1]
    mask = (col < lens[:, None]) & rowmask        # [B, L]

    qvals = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n_qual), 2)
    onehot = (qual.astype(jnp.int32)[:, :, None] == qvals) & mask[:, :, None]
    cycle_hist = jnp.sum(onehot, axis=0, dtype=jnp.int32)  # [L, n_qual]

    len_clip = jnp.clip(lens, 0, n_len - 1)
    len_hist = jnp.zeros((n_len,), jnp.int32).at[len_clip].add(
        rowmask[:, 0].astype(jnp.int32))
    return cycle_hist, len_hist


class QCAccumulator:
    """Accumulates device batch histograms into the C-layout totals."""

    def __init__(self):
        self.quality = np.zeros((N_QUAL, N_CYCLE), dtype=np.int64)  # [qual, cycle]
        self.seq_len = np.zeros(N_CYCLE, dtype=np.int64)

    def add_batch(self, qual: np.ndarray, lens: np.ndarray,
                  n_valid: int | None = None) -> None:
        if n_valid is None:
            n_valid = qual.shape[0]
        ch, lh = qc_histograms(jnp.asarray(qual), jnp.asarray(lens),
                               jnp.int32(n_valid))
        ch = np.asarray(ch)  # [L, 128]
        ncols = min(ch.shape[0], N_CYCLE)
        self.quality[:, :ncols] += ch[:ncols, :].T
        self.seq_len += np.asarray(lh)

    def merge(self, other: "QCAccumulator") -> None:
        self.quality += other.quality
        self.seq_len += other.seq_len

    def stats(self) -> dict:
        """Reproduces statSeqLen + statQ (reference fastq_count.c:37-74)."""
        freq = self.seq_len
        nz = np.flatnonzero(freq)
        sum_freq = int(freq.sum())
        total_len = float(np.sum(freq.astype(np.float64) * np.arange(N_CYCLE)))
        # C quirk (fastq_count.c:70): minLen is only set while it is still 0,
        # so a length-0 bin can never register; min is the first nonzero index.
        min_len = int(nz[0]) if len(nz) else 0
        max_len = int(nz[-1]) if len(nz) else 0
        qsum = int(self.quality.sum())
        q20 = int(self.quality[Q20_ASCII:, :].sum())
        q30 = int(self.quality[Q30_ASCII:, :].sum())
        return dict(read_count=sum_freq, base_count=total_len,
                    mean_len=(total_len / sum_freq) if sum_freq else float("nan"),
                    min_len=min_len, max_len=max_len,
                    q20_pct=(q20 / qsum * 100.0) if qsum else float("nan"),
                    q30_pct=(q30 / qsum * 100.0) if qsum else float("nan"),
                    qual_sum=qsum)
