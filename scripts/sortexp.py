#!/usr/bin/env python
"""TPU sort-pass experiments (dev tool, stretch item r2#9).

Compares LSD argsort variants on the real chip for the dedup shape
(B reads, W u32 key words + len + sumq):
  a) current: scan of 2-operand (u32 key, perm) sorts — one pass per key
  b) 2-key:   scan of 3-operand (u32, u32, perm) num_keys=2 sorts —
              half the passes IF the comparator doesn't explode compile
Measures compile (first call) and min-of-3 warm times with a real sync.
"""
from __future__ import annotations

import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

from ngstpu.utils.jaxsetup import setup_jax_cache

setup_jax_cache()
import functools

import jax
import jax.numpy as jnp

B = int(os.environ.get("SORTEXP_B", 1 << 21))
W = int(os.environ.get("SORTEXP_W", 7))


@jax.jit
def lsd_a(ks):  # ks: [P, B] least-significant-first
    B_ = ks.shape[1]
    perm0 = jax.lax.broadcasted_iota(jnp.int32, (B_,), 0)

    def body(perm, key_row):
        k = jnp.take(key_row, perm)
        _, perm = jax.lax.sort((k, perm), num_keys=1, is_stable=True)
        return perm, None

    perm, _ = jax.lax.scan(body, perm0, ks)
    return perm


@jax.jit
def lsd_b(kpairs):  # kpairs: [P/2, 2, B] least-significant-first pairs
    B_ = kpairs.shape[2]
    perm0 = jax.lax.broadcasted_iota(jnp.int32, (B_,), 0)

    def body(perm, pair):
        k1 = jnp.take(pair[0], perm)  # more significant of the pair
        k2 = jnp.take(pair[1], perm)
        _, _, perm = jax.lax.sort((k1, k2, perm), num_keys=2,
                                  is_stable=True)
        return perm, None

    perm, _ = jax.lax.scan(body, perm0, kpairs)
    return perm


def sync(x):
    return int(jnp.sum(x.astype(jnp.int64)) % 97)


def bench(fn, arg, label):
    t0 = time.monotonic()
    out = fn(arg)
    s = sync(out)
    t_compile = time.monotonic() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.monotonic()
        out = fn(arg)
        s ^= sync(out)
        best = min(best, time.monotonic() - t0)
    print(f"{label}: first={t_compile:.2f}s warm_min={best:.3f}s (chk {s})",
          flush=True)
    return np.asarray(out)


def main():
    only = os.environ.get("SORTEXP_ONLY", "both")
    rng = np.random.default_rng(0)
    # most-significant-first logical keys: W words, len, -sumq
    words = rng.integers(0, 1 << 32, (B, W), dtype=np.uint64).astype(np.uint32)
    lens = rng.integers(90, 101, B).astype(np.uint32)
    nsumq = (np.uint32(0xFFFFFFFF) - rng.integers(0, 4000, B,
                                                  dtype=np.uint64)
             .astype(np.uint32))
    msf = [words[:, w] for w in range(W)] + [lens, nsumq]
    lsf = np.stack(list(reversed(msf)))  # [P, B] least-significant-first
    print(f"B={B} passes={len(msf)}", flush=True)
    pa = None
    if only in ("a", "both"):
        pa = bench(lsd_a, jnp.asarray(lsf), "a) 2-operand chain")

    # pair up for num_keys=2: group lsf into consecutive pairs
    # (more-significant first within the pair); pad with a zero key
    P = len(msf)
    if P % 2:
        msf2 = [np.zeros(B, np.uint32)] + msf
    else:
        msf2 = msf
    pairs = []
    for i in range(len(msf2) - 2, -2, -2):
        # least-significant pair first; within pair [more, less]
        pairs.append(np.stack([msf2[i], msf2[i + 1]]))
    kp = np.stack(pairs)  # [P/2, 2, B]
    pb = None
    if only in ("b", "both"):
        pb = bench(lsd_b, jnp.asarray(kp), "b) 2-key chain")
    if pa is not None and pb is not None:
        print("identical:", np.array_equal(pa, pb))


if __name__ == "__main__":
    main()
