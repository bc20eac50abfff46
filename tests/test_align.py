import numpy as np

from ngstpu.ops.align import sw_score_batch, sw_score_numpy


def test_sw_vs_numpy_oracle():
    rng = np.random.default_rng(4)
    B, Lq, Lt = 16, 24, 32
    q = rng.integers(65, 69, (B, Lq)).astype(np.uint8)
    t = rng.integers(65, 69, (B, Lt)).astype(np.uint8)
    qlens = rng.integers(5, Lq + 1, B).astype(np.int32)
    tlens = rng.integers(5, Lt + 1, B).astype(np.int32)
    qm = np.arange(Lq)[None, :] < qlens[:, None]
    tm = np.arange(Lt)[None, :] < tlens[:, None]
    q = q * qm
    t = t * tm
    got = np.asarray(sw_score_batch(q, qlens, t, tlens))
    for i in range(B):
        ref = sw_score_numpy(bytes(q[i, :qlens[i]]), bytes(t[i, :tlens[i]]))
        assert got[i] == ref, (i, got[i], ref)


def test_sw_perfect_match_and_gap():
    q = np.frombuffer(b"ACGTACGT", dtype=np.uint8)[None, :].copy()
    t = np.frombuffer(b"ACGTACGT", dtype=np.uint8)[None, :].copy()
    s = np.asarray(sw_score_batch(q, np.array([8], np.int32),
                                  t, np.array([8], np.int32)))
    assert s[0] == 8  # 8 matches x score 1
    # single deletion: ACGTCGT vs ACGTACGT -> 7 matches - (open+ext)
    q2 = np.frombuffer(b"ACGTCGT\x00", dtype=np.uint8)[None, :].copy()
    s2 = np.asarray(sw_score_batch(q2, np.array([7], np.int32),
                                   t, np.array([8], np.int32)))
    assert s2[0] == max(7 - 7, 4)  # best local run without paying the gap: "ACGT"=4... or gapped 7-7=0
