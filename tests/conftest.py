"""Test config: run JAX on CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware.

Note: the environment's sitecustomize registers the axon TPU plugin and
forces JAX_PLATFORMS=axon, so plain env vars are not enough — we must
override via jax.config after import (verified to stick).
"""

import os
import pathlib
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

_repo = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_repo))

# Keep the suite off the global /dev/shm pool: it would grow the shared
# pool files and contend with a concurrently running bench/CLI for the
# flock. The dedicated bufpool tests opt back in with their own dirs.
os.environ.setdefault("NGSTPU_SHM_POOL", "0")

# Persistent XLA compilation cache: makes repeated test runs fast.
_cache = _repo / ".cache" / "jax"
_cache.mkdir(parents=True, exist_ok=True)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(_cache))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", str(_cache))
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, jax.devices()
