import numpy as np
import jax
import pytest

from ngstpu.ops.count import qc_histograms
from ngstpu.parallel.dist import shard_batch_arrays, sharded_pileup, sharded_qc_step
from ngstpu.parallel.mesh import make_mesh


def test_sharded_qc_matches_single_device():
    mesh = make_mesh(8)
    rng = np.random.default_rng(0)
    B, L = 64 * 8, 128
    seq = rng.integers(65, 85, (B, L), dtype=np.uint8)
    qual = rng.integers(33, 75, (B, L), dtype=np.uint8)
    lens = rng.integers(10, L + 1, B).astype(np.int32)
    n_valid = np.full(8, 64, dtype=np.int32)

    step = sharded_qc_step(mesh)
    with mesh:
        sseq, squal, slens, sval = shard_batch_arrays(mesh, seq, qual, lens,
                                                      n_valid)
        merged, gc, packed = step(sseq, squal, slens, sval)
    ch, lh = qc_histograms(qual, lens, np.int32(B))
    ref = np.asarray(ch)
    got = np.asarray(merged["cycle_hist"])
    assert (got == ref).all()
    assert (np.asarray(merged["len_hist"]) == np.asarray(lh)).all()


def test_sharded_pileup_matches_bruteforce():
    mesh = make_mesh(8)
    rng = np.random.default_rng(1)
    n_pos = 4096
    E = 64 * 8
    starts = rng.integers(0, n_pos - 100, E).astype(np.int32)
    ends = (starts + rng.integers(1, 100, E)).astype(np.int32)
    valid = np.ones(E, dtype=bool)
    fn = sharded_pileup(mesh, n_pos)
    with mesh:
        s, e, v = shard_batch_arrays(mesh, starts, ends, valid)
        depth = np.asarray(fn(s, e, v))
    oracle = np.zeros(n_pos, dtype=np.int64)
    for a, b in zip(starts, ends):
        oracle[a:b] += 1
    assert (depth == oracle).all()


def test_graft_dryrun_entrypoints():
    import importlib.util
    import pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).parent.parent / "__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn).lower(*args).compile()
    assert out is not None
    mod.dryrun_multichip(8)
