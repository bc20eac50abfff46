"""True multi-process distributed test: 2 jax processes over Gloo on CPU
exercise the cross-host stat allreduce (the DCN merge path of
parallel/multihost.py). The reference has no multi-node story at all
(SURVEY.md §4); this is the new framework's."""

import pathlib
import subprocess
import sys

import pytest

_CHILD = r"""
import os, re, sys
rank = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
# a parent pytest's 8-virtual-device forcing must not leak in: this test
# wants exactly ONE addressable device per process
flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
               os.environ.get("XLA_FLAGS", ""))
os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=2, process_id=rank)
sys.path.insert(0, sys.argv[3])
import numpy as np
from ngstpu.parallel.multihost import allreduce_stats, assign_shards, process_info
r, w = process_info()
assert w == 2
out = allreduce_stats({"q": np.full((3, 4), r + 1, np.int64)})
assert (out["q"] == 3).all()
# shard assignment is rank-consistent
paths = [f"/nonexistent/f{i}" for i in range(5)]
mine = assign_shards(paths)
other = assign_shards(paths, rank=1 - r, world=2)
assert not set(mine) & set(other)
assert sorted(set(mine) | set(other)) == sorted(paths)
print("OK")
"""


def _run_pair(tmp_path, src: str, port: str, extra: list[str] | None = None):
    child = tmp_path / "child.py"
    child.write_text(src)
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    procs = [subprocess.Popen(
        [sys.executable, str(child), str(i), port, repo] + (extra or []),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE) for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, err.decode()[-800:]
        assert b"OK" in out
        outs.append(out)
    return outs


def test_two_process_allreduce(tmp_path):
    _run_pair(tmp_path, _CHILD, "19741")


_CHILD_DEDUP = r"""
import os, re, sys
rank = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
# a parent pytest's 8-virtual-device forcing must not leak in: this test
# wants exactly ONE addressable device per process
flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
               os.environ.get("XLA_FLAGS", ""))
os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=2, process_id=rank)
sys.path.insert(0, sys.argv[3])
import numpy as np
from ngstpu.parallel.dsort import distributed_dedup
from ngstpu.parallel.mesh import make_mesh
rng = np.random.default_rng(5)
B, W = 1000, 3
words = rng.integers(0, 16, (B, W)).astype(np.uint32)
lens = rng.integers(8, 12, B).astype(np.int32)
sumq = rng.integers(0, 900, B).astype(np.uint32)
keys, klens, counts, rep = distributed_dedup(make_mesh(2), words, lens, sumq)
np.save(sys.argv[4] + f"/mpdedup{rank}.npy",
        np.concatenate([keys.reshape(-1).astype(np.int64),
                        klens.astype(np.int64), counts, rep]))
print("OK", len(counts))
"""


def test_two_process_distributed_dedup(tmp_path):
    """The fused hash-bucket all_to_all dedup across REAL process
    boundaries (2 jax processes over Gloo): result must be bit-identical
    on both ranks and to the single-process run of the same inputs."""
    import numpy as np

    _run_pair(tmp_path, _CHILD_DEDUP, "19742", [str(tmp_path)])
    mp0 = np.load(tmp_path / "mpdedup0.npy")
    mp1 = np.load(tmp_path / "mpdedup1.npy")
    assert np.array_equal(mp0, mp1)

    from ngstpu.parallel.dsort import distributed_dedup
    from ngstpu.parallel.mesh import make_mesh
    rng = np.random.default_rng(5)
    B, W = 1000, 3
    words = rng.integers(0, 16, (B, W)).astype(np.uint32)
    lens = rng.integers(8, 12, B).astype(np.int32)
    sumq = rng.integers(0, 900, B).astype(np.uint32)
    keys, klens, counts, rep = distributed_dedup(make_mesh(2), words, lens,
                                                 sumq)
    single = np.concatenate([keys.reshape(-1).astype(np.int64),
                             klens.astype(np.int64), counts, rep])
    assert np.array_equal(mp0, single)


_CHILD_SORT = r"""
import os, re, sys
rank = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
               os.environ.get("XLA_FLAGS", ""))
os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=1"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=2, process_id=rank)
sys.path.insert(0, sys.argv[3])
import numpy as np
from ngstpu.parallel.dsort import distributed_sort
from ngstpu.parallel.mesh import make_mesh
rng = np.random.default_rng(9)
B, W = 1200, 3
words = rng.integers(0, 64, (B, W)).astype(np.uint32)
lens = rng.integers(8, 12, B).astype(np.int32)
perm = distributed_sort(make_mesh(2), words, lens)
np.save(sys.argv[4] + f"/mpsort{rank}.npy", np.asarray(perm, np.int64))
print("OK", len(perm))
"""


def test_two_process_distributed_sort(tmp_path):
    """The sample-sort distributed ordered sort across REAL process
    boundaries: both ranks agree and match the single-process permutation
    bit-for-bit (gzfastq_sort -m semantics over a true 2-process mesh)."""
    import numpy as np

    _run_pair(tmp_path, _CHILD_SORT, "19743", [str(tmp_path)])
    mp0 = np.load(tmp_path / "mpsort0.npy")
    mp1 = np.load(tmp_path / "mpsort1.npy")
    assert np.array_equal(mp0, mp1)

    from ngstpu.parallel.dsort import distributed_sort
    from ngstpu.parallel.mesh import make_mesh
    rng = np.random.default_rng(9)
    B, W = 1200, 3
    words = rng.integers(0, 64, (B, W)).astype(np.uint32)
    lens = rng.integers(8, 12, B).astype(np.int32)
    perm = np.asarray(distributed_sort(make_mesh(2), words, lens), np.int64)
    assert np.array_equal(mp0, perm)
