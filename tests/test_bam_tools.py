import os
import subprocess

import numpy as np
import pytest

from ngstpu.testing.bamfixtures import index_bam, random_bam
from ngstpu.testing.oracles import run_oracle, samtools_exe
from ngstpu.tools.cli import main as cli_main

REFS = [("chr1", 150000), ("chr2", 80000), ("chrX", 43000)]


@pytest.fixture(scope="module")
def bam_fixture(tmp_path_factory):
    d = tmp_path_factory.mktemp("bam")
    p = str(d / "t.bam")
    random_bam(p, REFS, n_reads=4000, seed=7, read_len=100)
    if not index_bam(p):
        pytest.skip("no samtools for indexing")
    return p


def test_bam_reader_vs_samtools(bam_fixture):
    """Our decode agrees with samtools view on count/tid/pos/flag."""
    st = samtools_exe()
    out = subprocess.run([st, "view", bam_fixture], capture_output=True,
                         timeout=120)
    sam_lines = out.stdout.decode().strip().split("\n")
    from ngstpu.io.bam import read_bam
    header, cols = read_bam(bam_fixture)
    assert cols.n == len(sam_lines)
    f = sam_lines[0].split("\t")
    assert int(f[1]) == cols.flag[0]
    assert int(f[3]) == cols.pos[0] + 1
    assert header.ref_names[cols.tid[0]] == f[2]


def _run_both(tmp_path, tool, args_tpl, bam):
    ref_dir = tmp_path / "ref"
    ours_dir = tmp_path / "ours"
    ref_dir.mkdir()
    ours_dir.mkdir()
    ref = run_oracle(tool, args_tpl + [bam], cwd=str(ref_dir))
    if ref is None:
        pytest.skip("no C toolchain")
    assert ref.returncode == 0, ref.stderr.decode()[:500]
    old = os.getcwd()
    os.chdir(ours_dir)
    try:
        rc = cli_main([tool] + args_tpl + [bam])
        assert rc == 0
    finally:
        os.chdir(old)
    return ref_dir, ours_dir


def test_bam2depth_parity(tmp_path, bam_fixture):
    ref_dir, ours_dir = _run_both(tmp_path, "bam2depth",
                                  ["-o", "out", "-w", "7000", "-W"], bam_fixture)
    ref_files = sorted(os.listdir(ref_dir))
    ours_files = sorted(os.listdir(ours_dir))
    assert ref_files == ours_files
    for f in ref_files:
        assert (ours_dir / f).read_bytes() == (ref_dir / f).read_bytes(), f


def test_bam2depth_default_window(tmp_path, bam_fixture):
    ref_dir, ours_dir = _run_both(tmp_path, "bam2depth", ["-o", "out"],
                                  bam_fixture)
    for f in sorted(os.listdir(ref_dir)):
        assert (ours_dir / f).read_bytes() == (ref_dir / f).read_bytes(), f


def test_bam2wig_parity(tmp_path, bam_fixture):
    ref_dir, ours_dir = _run_both(tmp_path, "bam2wig",
                                  ["-o", "w", "-w", "9000"], bam_fixture)
    ref_files = sorted(os.listdir(ref_dir))
    ours_files = sorted(os.listdir(ours_dir))
    assert ref_files == ours_files
    for f in ref_files:
        assert (ours_dir / f).read_bytes() == (ref_dir / f).read_bytes(), f


def test_bam_split_chr_parity(tmp_path, bam_fixture):
    st = samtools_exe()
    ref_dir, ours_dir = _run_both(tmp_path, "bamSplitChr", ["-o", "s"],
                                  bam_fixture)
    ref_files = sorted(os.listdir(ref_dir))
    ours_files = sorted(os.listdir(ours_dir))
    assert ref_files == ours_files
    for f in ref_files:
        # BGZF bytes differ; compare SAM text decode
        rv = subprocess.run([st, "view", "-h", str(ref_dir / f)],
                            capture_output=True, timeout=120)
        ov = subprocess.run([st, "view", "-h", str(ours_dir / f)],
                            capture_output=True, timeout=120)
        assert rv.returncode == 0 and ov.returncode == 0, f
        assert ov.stdout == rv.stdout, f


def test_our_bai_matches_samtools_fetch(tmp_path):
    """bam2depth (C, index-based) produces identical output whether the
    .bai comes from samtools or from `ngstpu index`."""
    st = samtools_exe()
    if st is None:
        pytest.skip("no samtools")
    bam1 = str(tmp_path / "a.bam")
    bam2 = str(tmp_path / "b.bam")
    random_bam(bam1, REFS, n_reads=3000, seed=21, read_len=90)
    import shutil
    shutil.copy(bam1, bam2)
    assert index_bam(bam1)  # samtools index for a.bam
    from ngstpu.tools.cli import main as cli
    assert cli(["index", bam2]) == 0  # our index for b.bam
    d1 = tmp_path / "r1"
    d2 = tmp_path / "r2"
    d1.mkdir()
    d2.mkdir()
    r1 = run_oracle("bam2depth", ["-o", "out", "-w", "6000", bam1], cwd=str(d1))
    r2 = run_oracle("bam2depth", ["-o", "out", "-w", "6000", bam2], cwd=str(d2))
    assert r1.returncode == 0 and r2.returncode == 0, (
        r1.stderr.decode()[:200], r2.stderr.decode()[:200])
    f1 = sorted(os.listdir(d1))
    f2 = sorted(os.listdir(d2))
    assert [f.replace("a.bam", "x") for f in f1] == \
        [f.replace("b.bam", "x") for f in f2]
    for fa, fb in zip(f1, f2):
        assert (d1 / fa).read_bytes() == (d2 / fb).read_bytes(), fa


def test_bai_region_decode_matches_full_scan(tmp_path):
    """read_bam_region (BAI-driven partial BGZF decode) must return a
    superset of the region's records that filters to exactly the full-scan
    result, for our own index."""
    from ngstpu.io.bai import write_bai
    from ngstpu.io.bam import read_bam, read_bam_region
    from ngstpu.ops.bamops import parse_region, region_mask
    from ngstpu.testing.bamfixtures import random_bam

    bam = str(tmp_path / "r.bam")
    random_bam(bam, [("ref0", 200000), ("ref1", 200000), ("ref2", 200000)],
               3000, seed=21)
    write_bai(bam)
    header, full = read_bam(bam)

    for region in ("ref1:50,001-60,000", "ref0", "ref2:199,000-200,000",
                   "ref0:1-1"):
        ref, beg, end = parse_region(header, region)
        want = region_mask(full, ref, beg, end)
        got_h, got = read_bam_region(bam, ref, beg, end)
        gmask = region_mask(got, ref, beg, end)
        # identical record identity: compare (tid, pos, flag, l_qseq) rows
        w = np.stack([full.tid[want], full.pos[want], full.flag[want],
                      full.l_qseq[want]])
        g = np.stack([got.tid[gmask], got.pos[gmask], got.flag[gmask],
                      got.l_qseq[gmask]])
        assert np.array_equal(w, g), region
    # missing index -> None (caller falls back)
    import os
    os.remove(bam + ".bai")
    assert read_bam_region(bam, 0, 0, 100) is None


def test_wig_window_bins_vectorized_matches_exact_fuzz():
    """Production wig binning (vectorized) vs the bam2wig.c loop port, over
    random windows / target lengths / clamped-final-window cases, including
    intervals ending exactly on window and target boundaries."""
    import numpy as np

    from ngstpu.ops.bamops import wig_window_bins, wig_window_bins_exact

    rng = np.random.default_rng(77)
    for _ in range(300):
        W = int(rng.choice([1, 2, 3, 5, 20, 100, 20000]))
        tlen = int(rng.integers(1, 40) * W + rng.integers(0, W))
        n_windows = int(rng.choice([tlen // W + 1, max(tlen // W, 1),
                                    tlen // W + 3]))
        k = int(rng.integers(0, 50))
        hi = tlen + 3 * W
        if k:
            edges = np.sort(rng.choice(np.arange(0, hi),
                                       size=min(2 * k, hi), replace=False))
            if len(edges) % 2:
                edges = edges[:-1]
            starts, ends = edges[0::2], edges[1::2]
            ok = ends > starts
            starts, ends = starts[ok].astype(np.int64), ends[ok].astype(np.int64)
        else:
            starts = ends = np.zeros(0, np.int64)
        depths = rng.integers(1, 30, len(starts)).astype(np.float64)
        a = wig_window_bins(starts, ends, depths, W, n_windows, tlen)
        b = wig_window_bins_exact(starts, ends, depths, W, n_windows, tlen)
        assert np.allclose(a, b), (W, tlen, n_windows)


def test_wig_window_bins_vectorized_speed():
    """VERDICT round-1 done-criterion: 100k intervals bin in well under
    50ms (the loop port took seconds at this scale)."""
    import time

    import numpy as np

    from ngstpu.ops.bamops import wig_window_bins

    n = 100_000
    starts = np.sort(np.random.default_rng(0).integers(0, 2_000_000, n))
    ends = starts + 80
    depths = np.ones(n)
    wig_window_bins(starts, ends, depths, 20000, 101, 2_000_000)  # warm
    t0 = time.monotonic()
    wig_window_bins(starts, ends, depths, 20000, 101, 2_000_000)
    assert time.monotonic() - t0 < 0.05


def test_bam2wig_dense_matches_sparse_lazy_regime(tmp_path, monkeypatch):
    """bam2wig through the dense fast path (lazy-allocation regime forced
    via a tiny prealloc cap) must byte-match the sparse event path."""
    from ngstpu.testing.bamfixtures import random_bam_fast
    from ngstpu.tools import bam2wig

    bam = tmp_path / "w.bam"
    random_bam_fast(str(bam), [("c1", 60000), ("c2", 40000)], 4000, seed=9)
    from ngstpu.utils.timing import StageTimer

    monkeypatch.setenv("NGSTPU_DENSE_PREALLOC_MAX", "1000")  # force lazy
    bam2wig.process_bam(str(bam), 1, str(tmp_path / "dense"), 5000,
                        StageTimer())
    monkeypatch.delenv("NGSTPU_DENSE_PREALLOC_MAX")

    # sparse reference: run _emit_wig over stream_chrom_events directly
    from ngstpu.io.bam import FUNMAP
    from ngstpu.ops.bamops import merged_intervals, stream_chrom_events
    header, events = stream_chrom_events(str(bam), FUNMAP)
    bam2wig._emit_wig(str(bam), header,
                      (merged_intervals(p, d) for p, d in events),
                      1, str(tmp_path / "sparse"), 5000, StageTimer())
    for suf in (".1.wig", ".1.chromSize.txt"):
        assert (tmp_path / ("dense" + suf)).read_bytes() == \
            (tmp_path / ("sparse" + suf)).read_bytes(), suf


def test_bam2depth_dense_midstream_fallback(tmp_path, monkeypatch):
    """A corrupt (negative-start) record on chromosome 2 kills the dense
    fast path AFTER chromosome 1 was already emitted; with file outputs the
    tool must rerun on the sparse path with truncated files (no duplicated
    rows), and with stdout output it must refuse instead of double-emitting
    (bam2depth.c has no such fallback: its hash path tolerates any int key,
    so parity demands the sparse rerun produce the hash-path output)."""
    import ngstpu.io.bam as iobam
    from ngstpu.testing.bamfixtures import encode_record, make_bam
    from ngstpu.tools import bam2depth
    from ngstpu.utils.timing import StageTimer

    # this test targets the DENSE engine's midstream corrupt-coordinate
    # fallback; pin the mode (the shallow fixture would otherwise route
    # to event mode under the density heuristic)
    monkeypatch.setenv("NGSTPU_PILEUP_MODE", "dense")
    seq = "ACGT" * 25
    recs = [encode_record(f"a{i}", 0, 10 + i, 30, "100M", seq)
            for i in range(800)]
    recs += [encode_record(f"b{i}", 1, 5 + i, 30, "100M", seq)
             for i in range(800)]
    recs += [encode_record("bad", 1, -7, 30, "100M", seq)]
    bam = tmp_path / "mid.bam"
    make_bam(str(bam), [("c1", 5000), ("c2", 4000)], recs)

    # tiny chunks so c1 is emitted BEFORE the chunk holding the corrupt
    # record is scanned — the failure must strike mid-emit
    dense_orig = iobam.stream_depth_dense
    monkeypatch.setattr(
        iobam, "stream_depth_dense",
        lambda p, m, **kw: dense_orig(p, m, chunk_bytes=2048, **kw))

    monkeypatch.chdir(tmp_path)
    bam2depth.process_bam(str(bam), 1, str(tmp_path / "fb"), 700, True,
                          StageTimer())

    # expected: force the sparse path by disabling the dense scan
    monkeypatch.setattr(iobam, "stream_depth_dense",
                        lambda *a, **k: None)
    sparse_dir = tmp_path / "sp"
    sparse_dir.mkdir()
    monkeypatch.chdir(sparse_dir)
    bam2depth.process_bam(str(bam), 1, str(sparse_dir / "fb"), 700, True,
                          StageTimer())
    for name in ("mid.bam.1.bedGraph",):
        assert (tmp_path / name).read_bytes() == \
            (sparse_dir / name).read_bytes(), name
    for suf in (".1.depth", ".1.wig", ".1.chromSize.txt"):
        assert (tmp_path / ("fb" + suf)).read_bytes() == \
            (sparse_dir / ("fb" + suf)).read_bytes(), suf

    # stdout output: must raise, not double-emit chromosome 1
    monkeypatch.undo()
    monkeypatch.setenv("NGSTPU_PILEUP_MODE", "dense")  # undo() cleared it
    monkeypatch.setattr(
        iobam, "stream_depth_dense",
        lambda p, m, **kw: dense_orig(p, m, chunk_bytes=2048, **kw))
    monkeypatch.chdir(tmp_path)
    with pytest.raises(ValueError, match="stdout"):
        bam2depth.process_bam(str(bam), 2, "-", 700, False, StageTimer())


def test_bam2depth_event_mode_parity(tmp_path, monkeypatch, bam_fixture):
    """The event-mode pileup engine (NGSTPU_PILEUP_MODE=events:
    stream_pileup_events + radix sweep) must byte-match the C oracle
    exactly like the dense/default engine does."""
    monkeypatch.setenv("NGSTPU_PILEUP_MODE", "events")
    ref_dir, ours_dir = _run_both(tmp_path, "bam2depth",
                                  ["-o", "out", "-w", "6000", "-W"],
                                  bam_fixture)
    ref_files = sorted(os.listdir(ref_dir))
    assert ref_files == sorted(os.listdir(ours_dir))
    for f in ref_files:
        assert (ours_dir / f).read_bytes() == (ref_dir / f).read_bytes(), f


def test_bam2wig_event_mode_parity(tmp_path, monkeypatch, bam_fixture):
    monkeypatch.setenv("NGSTPU_PILEUP_MODE", "events")
    ref_dir, ours_dir = _run_both(tmp_path, "bam2wig",
                                  ["-o", "out", "-w", "6000"], bam_fixture)
    ref_files = sorted(os.listdir(ref_dir))
    assert ref_files == sorted(os.listdir(ours_dir))
    for f in ref_files:
        assert (ours_dir / f).read_bytes() == (ref_dir / f).read_bytes(), f


def test_choose_pileup_mode_heuristic(tmp_path, monkeypatch):
    from ngstpu.io.bam import choose_pileup_mode
    from ngstpu.testing.bamfixtures import encode_record, make_bam

    seq = "ACGT" * 25
    # shallow relative to the genome (1 read over 5Mbp): event mode
    small = tmp_path / "small.bam"
    make_bam(str(small), [("c1", 5_000_000)],
             [encode_record("r", 0, 10, 30, "100M", seq)])
    assert choose_pileup_mode(str(small)) == "events"

    # deep relative to the genome (500 reads stacked on 300bp): the
    # estimated events rival genome positions -> dense scatter
    deep = tmp_path / "deep.bam"
    make_bam(str(deep), [("c1", 300)],
             [encode_record(f"r{i}", 0, i % 200, 30, "100M", seq)
              for i in range(500)])
    assert choose_pileup_mode(str(deep)) == "dense"

    monkeypatch.setenv("NGSTPU_PILEUP_MODE", "dense")
    assert choose_pileup_mode(str(small)) == "dense"
    monkeypatch.setenv("NGSTPU_PILEUP_MODE", "sparse")
    assert choose_pileup_mode(str(small)) == "sparse"


def test_pileup_emit_fused_matches_unfused_fuzz():
    """The fused event-mode emitter (ngs_pileup_emit_se: sweep + interval
    merge + row format + window bins in one native pass) must byte/value-
    match the unfused merged_intervals_runs + format_int3_rows +
    depth_window_bins chain on adversarial layouts: overtaken multi-M
    starts, +1/-1 cancellation at one position (equal-depth interval
    merging), duplicate coordinates, and intervals past the window range."""
    import numpy as np

    from ngstpu.io.native import format_int3_rows, get_lib
    from ngstpu.ops.bamops import (depth_window_bins, merged_intervals_runs,
                                   pileup_emit_runs)

    if get_lib() is None:
        import pytest
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(11)
    for trial in range(40):
        ns = int(rng.integers(1, 400))
        window = int(rng.integers(3, 50))
        n_windows = int(rng.integers(1, 30))
        tlen = n_windows * window - int(rng.integers(0, window))
        starts = rng.integers(0, max(2, tlen + 10), ns).astype(np.int32)
        if trial % 3 == 0:
            starts = np.sort(starts)  # coordinate-sorted main stream
        if trial % 5 == 0 and ns > 4:
            starts[::4] = starts[0]  # heavy duplicates + cancellation
        lens = rng.integers(1, 30, ns).astype(np.int32)
        ends = starts + lens
        pos = np.concatenate([starts, ends]).astype(np.int32)
        delta = np.concatenate([np.ones(ns, np.int32),
                                -np.ones(ns, np.int32)])
        name = f"chrF{trial}".encode()
        fused = pileup_emit_runs(pos, delta, name, window, n_windows)
        assert fused is not None
        s, e, d = merged_intervals_runs(pos, delta, "host")
        rows = format_int3_rows(name, s, e, d) if len(s) else b""
        bins = depth_window_bins(s, e, d, window, n_windows, tlen)
        assert fused[0] == rows, f"trial {trial} rows differ"
        assert np.array_equal(fused[1], bins), f"trial {trial} bins differ"


def test_event_mode_debug_poolviews_parity(tmp_path, monkeypatch,
                                           bam_fixture):
    """NGSTPU_DEBUG_POOLVIEWS switches the zero-copy pooled rotations
    (event flush pairs, fused emit text) to owned copies; output must be
    identical — the debug mode exists to bisect rotation-contract
    violations (advisor r4)."""
    monkeypatch.setenv("NGSTPU_PILEUP_MODE", "events")
    monkeypatch.setenv("NGSTPU_DEBUG_POOLVIEWS", "1")
    ref_dir, ours_dir = _run_both(tmp_path, "bam2depth",
                                  ["-o", "out", "-w", "6000", "-W"],
                                  bam_fixture)
    for f in sorted(os.listdir(ref_dir)):
        assert (ours_dir / f).read_bytes() == (ref_dir / f).read_bytes(), f
