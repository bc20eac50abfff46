"""Buffer-pool behavior: tmpfs-backed cross-process persistence (round 5),
flock exclusivity, budget gating, and anon fallback correctness."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import json, os, sys
sys.path.insert(0, %r)
import ngstpu.utils.bufpool as bp
a = bp.get_buffer("t.shm", 8 << 20)
a[:16] = 7
print(json.dumps({"shm_dir": bp._shm_dir, "ok": bool((a[:16] == 7).all())}))
"""


def _run_child(pool_dir, extra_env=None):
    # conftest disables the pool suite-wide; re-enable for these tests
    env = {**os.environ, "NGSTPU_SHM_POOL": "1",
           "NGSTPU_SHM_POOL_DIR": pool_dir, **(extra_env or {})}
    r = subprocess.run([sys.executable, "-c", _CHILD % REPO],
                       capture_output=True, text=True, env=env, timeout=60)
    assert r.returncode == 0, r.stderr
    return json.loads(r.stdout)


def test_shm_pool_persists_across_processes(tmp_path):
    d = str(tmp_path / "pool")
    out1 = _run_child(d)
    assert out1["ok"] and out1["shm_dir"] == d
    assert (tmp_path / "pool" / "t.shm.buf").exists()
    size1 = (tmp_path / "pool" / "t.shm.buf").stat().st_size
    # second process maps the SAME file (the warm-page reuse contract)
    out2 = _run_child(d)
    assert out2["ok"] and out2["shm_dir"] == d
    assert (tmp_path / "pool" / "t.shm.buf").stat().st_size == size1


def test_shm_pool_contention_falls_back_to_anon(tmp_path):
    import fcntl

    d = tmp_path / "pool"
    d.mkdir()
    fd = os.open(str(d / ".lock"), os.O_RDWR | os.O_CREAT, 0o600)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        out = _run_child(str(d))
        # child must stay functional on private anonymous memory
        assert out["ok"] and out["shm_dir"] == ""
        assert not (d / "t.shm.buf").exists()
    finally:
        os.close(fd)


def test_shm_pool_opt_out_and_budget(tmp_path):
    d = str(tmp_path / "pool")
    out = _run_child(d, {"NGSTPU_SHM_POOL": "0"})
    assert out["ok"] and out["shm_dir"] == ""
    # a zero budget forces every buffer onto anonymous memory but the
    # pool dir is still claimed (lock exists, no .buf files)
    out = _run_child(d, {"NGSTPU_SHM_POOL_MAX_GB": "0"})
    assert out["ok"]
    assert not (tmp_path / "pool" / "t.shm.buf").exists()


def test_shm_pool_grow_across_processes(tmp_path):
    d = str(tmp_path / "pool")
    _run_child(d)
    size1 = (tmp_path / "pool" / "t.shm.buf").stat().st_size
    child = _CHILD.replace("8 << 20", "64 << 20")
    env = {**os.environ, "NGSTPU_SHM_POOL": "1",
           "NGSTPU_SHM_POOL_DIR": d}
    r = subprocess.run([sys.executable, "-c", child % REPO],
                       capture_output=True, text=True, env=env, timeout=60)
    assert r.returncode == 0, r.stderr
    assert json.loads(r.stdout)["ok"]
    assert (tmp_path / "pool" / "t.shm.buf").stat().st_size > size1


def test_clear_shm_pool(tmp_path):
    d = str(tmp_path / "pool")
    _run_child(d)
    assert (tmp_path / "pool" / "t.shm.buf").exists()
    child = """
import json, os, sys
sys.path.insert(0, %r)
import ngstpu.utils.bufpool as bp
bp.get_buffer("t.shm", 1 << 20)
bp.clear_shm_pool()
print(json.dumps(sorted(os.listdir(bp._shm_dir))))
""" % REPO
    env = {**os.environ, "NGSTPU_SHM_POOL": "1", "NGSTPU_SHM_POOL_DIR": d}
    r = subprocess.run([sys.executable, "-c", child],
                       capture_output=True, text=True, env=env, timeout=60)
    assert r.returncode == 0, r.stderr
    # every .buf reclaimed; only the lock file remains
    assert json.loads(r.stdout) == [".lock"]
