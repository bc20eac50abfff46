"""Pallas TPU kernel for the per-cycle quality histogram.

The hot loop of fastq_count (reference fastq_count.c:29-35 AssignQuality)
as a hand-scheduled TPU kernel: the batch streams through VMEM in row
blocks (the grid), and a [NQ, L] accumulator stays resident in the output
block across grid steps (constant index_map -> block revisiting). Each
grid step runs a fori_loop over the 128 quality values doing a vectorized
compare-and-reduce on the VPU — one [BB, L] compare + row-reduction per
quality value, accumulated as a row store (lane-contiguous).

Returns hist[NQ, L] (note: transposed vs ops.count.qc_histograms' [L, NQ]).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_QUAL = 128
BLOCK_B = 512


def _hist_kernel(qual_ref, lens_ref, nvalid_ref, out_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    bb, L = qual_ref.shape
    base_row = i * bb
    col = jax.lax.broadcasted_iota(jnp.int32, (bb, L), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (bb, 1), 0) + base_row
    mask = (col < lens_ref[:]) & (row < nvalid_ref[0])
    q = qual_ref[:].astype(jnp.int32)

    def body(qi, _):
        eq = (q == qi) & mask
        out_ref[qi, :] += jnp.sum(eq.astype(jnp.int32), axis=0)
        return 0

    jax.lax.fori_loop(0, N_QUAL, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def qc_hist_pallas(qual: jax.Array, lens: jax.Array, n_valid: jax.Array,
                   interpret: bool = False) -> jax.Array:
    """qual uint8 [B, L] (B % BLOCK_B == 0), lens int32 [B], n_valid scalar.
    Returns int32 [N_QUAL, L]."""
    B, L = qual.shape
    grid = (B // BLOCK_B,)
    return pl.pallas_call(
        _hist_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_B, L), lambda i: (i, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((BLOCK_B, 1), lambda i: (i, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((N_QUAL, L), lambda i: (0, 0),
                               memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N_QUAL, L), jnp.int32),
        interpret=interpret,
    )(qual, lens.reshape(B, 1), jnp.asarray([n_valid], jnp.int32))
