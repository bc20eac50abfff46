"""True multi-process distributed test: 2 jax processes over Gloo on CPU
exercise the cross-host stat allreduce (the DCN merge path of
parallel/multihost.py). The reference has no multi-node story at all
(SURVEY.md §4); this is the new framework's."""

import pathlib
import subprocess
import sys

import pytest

_CHILD = r"""
import os, sys
rank = int(sys.argv[1]); port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
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


def test_two_process_allreduce(tmp_path):
    child = tmp_path / "child.py"
    child.write_text(_CHILD)
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    port = "19741"
    procs = [subprocess.Popen([sys.executable, str(child), str(i), port, repo],
                              stdout=subprocess.PIPE, stderr=subprocess.PIPE)
             for i in range(2)]
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, err.decode()[-800:]
        assert b"OK" in out
