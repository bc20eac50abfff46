"""Streaming BAM decode (bounded RSS) vs the whole-file path."""

import numpy as np
import pytest

from ngstpu.io.bam import BamStream, read_bam
from ngstpu.testing.bamfixtures import random_bam


@pytest.fixture(scope="module")
def bam(tmp_path_factory):
    d = tmp_path_factory.mktemp("bamstream")
    p = d / "s.bam"
    random_bam(str(p), [("chr1", 200000), ("chr2", 150000), ("chr3", 90000)],
               30000, seed=11)
    return str(p)


def test_stream_equals_whole_file(bam):
    header, cols = read_bam(bam)
    # tiny batches force many carry-across-boundary records
    stream = BamStream(bam, chunk_bytes=1 << 14)
    assert stream.header.ref_names == header.ref_names
    parts = list(stream)
    assert len(parts) > 3  # actually chunked
    for field in ("tid", "pos", "flag", "mapq", "l_qseq", "gc"):
        got = np.concatenate([getattr(c, field) for c in parts])
        assert (got == getattr(cols, field)).all(), field
    got_ops = np.concatenate([c.cigar_op for c in parts])
    assert (got_ops == cols.cigar_op).all()
    # raw record bytes survive the carry logic
    whole = b"".join(
        c.body[int(c.rec_offset[0]):
               int(c.rec_offset[-1] + c.rec_len[-1])].tobytes()
        for c in parts if c.n)
    ref = cols.body[int(cols.rec_offset[0]):
                    int(cols.rec_offset[-1] + cols.rec_len[-1])].tobytes()
    assert whole == ref


def test_stream_chrom_events_matches_batch(bam):
    from ngstpu.io.bam import DEF_MASK
    from ngstpu.ops.bamops import cigar_m_events, stream_chrom_events

    header, cols = read_bam(bam)
    mask = ((cols.flag & DEF_MASK) == 0) & (cols.tid >= 0)
    tids, starts, ends = cigar_m_events(cols, mask)

    sheader, events = stream_chrom_events(bam, DEF_MASK, chunk_bytes=1 << 14)
    assert sheader.ref_names == header.ref_names
    got = list(events)
    assert len(got) == header.n_refs
    for t in range(header.n_refs):
        sel = tids == t
        exp = np.sort(np.concatenate([
            (starts[sel].astype(np.int64) << 2) + 1,
            (ends[sel].astype(np.int64) << 2)]))
        pos, delta = got[t]
        assert len(pos) == 2 * int(sel.sum())
        key = np.sort((pos.astype(np.int64) << 2) + (delta > 0))
        assert (key == exp).all()


def test_stream_truncated_bgzf_raises(tmp_path, bam):
    data = open(bam, "rb").read()
    p = tmp_path / "trunc.bam"
    p.write_bytes(data[:-37])  # cut inside the final blocks
    from ngstpu.io.bgzf import iter_inflated

    with pytest.raises(ValueError):
        for _ in iter_inflated(str(p), chunk_bytes=1 << 14):
            pass


def _events_to_dense(pos, delta, length):
    dense = np.zeros(length, np.int64)
    np.add.at(dense, pos.astype(np.int64), delta.astype(np.int64))
    return dense


def _assert_dense_matches_events(path, chunk_bytes=1 << 14):
    from ngstpu.io.bam import DEF_MASK, stream_depth_dense
    from ngstpu.ops.bamops import stream_chrom_events

    got = stream_depth_dense(path, DEF_MASK, chunk_bytes=chunk_bytes)
    if got is None:
        pytest.skip("native library unavailable")
    header, per_ref = got
    _, events = stream_chrom_events(path, DEF_MASK, chunk_bytes=chunk_bytes)
    for (dense, evs), (pos, delta) in zip(per_ref, events):
        exp = _events_to_dense(pos, delta, max(len(dense), 1))
        assert (dense[:len(exp)].astype(np.int64) == exp).all()
        assert (dense[len(exp):] == 0).all()
        assert evs * 2 == len(pos)
    return header


def test_dense_depth_matches_events(bam):
    _assert_dense_matches_events(bam)


def test_dense_depth_unsorted_and_overhang(tmp_path):
    """Interleaved tids (monotone off) and alignments past the declared
    reference end (allocation-growth handshake) both match the event path."""
    from ngstpu.testing.bamfixtures import encode_record, make_bam

    refs = [("c1", 5000), ("c2", 3000)]
    recs = []
    seq = "ACGT" * 25
    for i, (tid, pos) in enumerate([(1, 100), (0, 4990), (1, 2990), (0, 50),
                                    (1, 0), (0, 4000), (0, 30), (1, 2000)]):
        # 100M overhangs the short refs at the high positions; add D/N/I mix
        cigar = "40M10D30M20N30M" if i % 3 == 0 else "100M"
        flag = 0x400 if i == 5 else 0  # one duplicate: must be filtered
        recs.append(encode_record(f"r{i}", tid, pos, 30, cigar, seq,
                                  flag=flag))
    p = tmp_path / "weird.bam"
    make_bam(str(p), refs, recs)
    _assert_dense_matches_events(str(p), chunk_bytes=1 << 12)


def test_depth_emit_dense_matches_numpy(bam):
    from ngstpu.io.bam import DEF_MASK, stream_depth_dense
    from ngstpu.io.native import depth_emit_dense, format_int3_rows
    from ngstpu.ops.bamops import (depth_window_bins, merged_intervals,
                                   stream_chrom_events)

    got = stream_depth_dense(bam, DEF_MASK)
    if got is None:
        pytest.skip("native library unavailable")
    header, per_ref = got
    _, events = stream_chrom_events(bam, DEF_MASK)
    for tlen, name, (dense, evs), (pos, delta) in zip(
            header.ref_lens, header.ref_names, per_ref, events):
        for window in (700, 20000):
            n_windows = tlen // window + 1
            rows, bins = depth_emit_dense(dense, evs, name.encode(), window,
                                          n_windows)
            starts, ends, depths = merged_intervals(pos, delta)
            exp_rows = format_int3_rows(name.encode(), starts, ends, depths)
            exp_bins = depth_window_bins(starts, ends, depths, window,
                                         n_windows, tlen)
            assert rows == exp_rows
            assert np.allclose(bins, exp_bins)


def test_dense_depth_spill_overflow_undo(tmp_path):
    """>4096 overhanging runs in one chunk exceeds the spill capacity;
    the fast pass must undo itself exactly and redo via the handshake."""
    from ngstpu.testing.bamfixtures import encode_record, make_bam

    refs = [("c1", 300)]
    seq = "ACGT" * 25
    recs = [encode_record(f"r{i}", 0, 250 + (i % 40), 30, "100M", seq)
            for i in range(5000)]  # all overhang the 300bp ref
    p = tmp_path / "spilly.bam"
    make_bam(str(p), refs, recs)
    _assert_dense_matches_events(str(p), chunk_bytes=32 << 20)


def test_dense_depth_negative_start_raises(tmp_path):
    from ngstpu.io.bam import (DEF_MASK, DensePileupUnsupported,
                               stream_depth_dense)
    from ngstpu.testing.bamfixtures import encode_record, make_bam

    refs = [("c1", 1000)]
    seq = "ACGT" * 25
    recs = [encode_record("rneg", 0, -5, 30, "100M", seq)]
    p = tmp_path / "neg.bam"
    make_bam(str(p), refs, recs)
    got = stream_depth_dense(str(p), DEF_MASK)
    if got is None:
        pytest.skip("native library unavailable")
    with pytest.raises(DensePileupUnsupported):
        list(got[1])


def test_stream_pileup_events_matches_batch(bam):
    """The native event-mode stream (prefetching inflater + fused M-event
    extractor) produces the same per-chromosome event multisets as the
    whole-file decode, including with tiny chunks forcing carries."""
    from ngstpu.io.bam import DEF_MASK, FUNMAP, read_bam, stream_pileup_events
    from ngstpu.ops.bamops import cigar_m_events

    header, cols = read_bam(bam)
    for mask in (DEF_MASK, FUNMAP):
        m = ((cols.flag & mask) == 0) & (cols.tid >= 0)
        tids, starts, ends = cigar_m_events(cols, m)
        got = stream_pileup_events(bam, mask, chunk_bytes=1 << 14)
        if got is None:
            pytest.skip("native library unavailable")
        sheader, events = got
        assert sheader.ref_names == header.ref_names
        out = list(events)
        assert len(out) == header.n_refs
        for t in range(header.n_refs):
            sel = tids == t
            exp = np.sort(np.concatenate([
                (starts[sel].astype(np.int64) << 2) + 1,
                (ends[sel].astype(np.int64) << 2)]))
            pos, delta = out[t]
            key = np.sort((pos.astype(np.int64) << 2) + (delta > 0))
            assert np.array_equal(key, exp), (mask, t)


def test_stream_pileup_events_truncated_raises(tmp_path, bam):
    """Corruption surfaces through the prefetching background inflater:
    a mid-file BGZF cut and a mid-record cut both raise ValueError."""
    from ngstpu.io.bam import DEF_MASK, stream_pileup_events

    data = open(bam, "rb").read()
    p1 = tmp_path / "cut_block.bam"
    p1.write_bytes(data[:-37])  # cut inside the trailing blocks
    got = stream_pileup_events(str(p1), DEF_MASK, chunk_bytes=1 << 14)
    if got is None:
        pytest.skip("native library unavailable")
    with pytest.raises(ValueError):
        list(got[1])

    # re-wrap a truncated RECORD inside valid BGZF blocks
    from ngstpu.io.bgzf import compress_bgzf, read_bgzf
    raw = read_bgzf(bam)
    p2 = tmp_path / "cut_record.bam"
    p2.write_bytes(compress_bgzf(raw[:-11]))
    got = stream_pileup_events(str(p2), DEF_MASK, chunk_bytes=1 << 14)
    with pytest.raises(ValueError):
        list(got[1])


def test_pileup_sweep_se_matches_generic():
    """ngs_pileup_sweep_se (sorted starts + radix ends + merge) must equal
    ngs_pileup_sweep over the combined events; merged_intervals_runs must
    fall back when the starts half is not ascending."""
    from ngstpu.io.native import get_lib
    from ngstpu.ops.bamops import merged_intervals, merged_intervals_runs

    lib = get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(23)
    for trial, (n, sort_starts) in enumerate(
            [(1, True), (5, True), (1000, True), (200000, True),
             (1000, False), (200000, False)]):  # unsorted: all-extras path
        starts = rng.integers(0, 1 << 27, n).astype(np.int32)
        if sort_starts:
            starts = np.sort(starts)
        ends = starts + rng.integers(1, 300, n).astype(np.int32)
        u_pos = np.empty(2 * n, np.int64)
        u_dep = np.empty(2 * n, np.int64)
        k = lib.ngs_pileup_sweep_se(starts, np.ascontiguousarray(ends), n,
                                    u_pos, u_dep, 0)
        pos = np.concatenate([starts, ends]).astype(np.int32)
        delta = np.concatenate([np.ones(n, np.int32),
                                -np.ones(n, np.int32)])
        e_pos = np.empty(2 * n, np.int64)
        e_dep = np.empty(2 * n, np.int64)
        ke = lib.ngs_pileup_sweep(pos, delta, 2 * n, e_pos, e_dep, 0)
        assert k == ke and (u_pos[:k] == e_pos[:k]).all() \
            and (u_dep[:k] == e_dep[:k]).all(), trial

        got = merged_intervals_runs(pos, delta, "host")
        exp = merged_intervals(pos.copy(), delta.copy(), "host")
        for a, b in zip(got, exp):
            assert np.array_equal(a, b), trial

    # non-ascending starts: handled by the extras partition, same output
    starts = np.array([100, 50, 200], np.int32)
    ends = starts + 30
    pos = np.concatenate([starts, ends]).astype(np.int32)
    delta = np.concatenate([np.ones(3, np.int32), -np.ones(3, np.int32)])
    got = merged_intervals_runs(pos, delta, "host")
    exp = merged_intervals(pos.copy(), delta.copy(), "host")
    for a, b in zip(got, exp):
        assert np.array_equal(a, b)


def test_out_of_range_tid_does_not_poison_event_stream(tmp_path):
    """A record whose tid is outside the header must be skipped WITHOUT
    entering the monotone tracking: previously one corrupt tid flushed
    every later chromosome early, silently emptying them. All three
    engines must agree and keep chromosome 2's events."""
    from ngstpu.io.bam import (DEF_MASK, stream_depth_dense,
                               stream_pileup_events)
    from ngstpu.ops.bamops import stream_chrom_events
    from ngstpu.testing.bamfixtures import encode_record, make_bam

    seq = "ACGT" * 25
    recs = [encode_record(f"a{i}", 0, 10 + i, 30, "100M", seq)
            for i in range(30)]
    recs += [encode_record("bad", 50, 99, 30, "100M", seq)]  # tid=50
    recs += [encode_record(f"b{i}", 1, 5 + i, 30, "100M", seq)
             for i in range(20)]
    bam = tmp_path / "oob.bam"
    make_bam(str(bam), [("c1", 5000), ("c2", 4000)], recs)

    results = []
    for name, get in [
            ("events", lambda: stream_pileup_events(str(bam), DEF_MASK,
                                                    chunk_bytes=2048)),
            ("sparse", lambda: stream_chrom_events(str(bam), DEF_MASK,
                                                   chunk_bytes=2048))]:
        got = get()
        if got is None:
            pytest.skip("native library unavailable")
        out = [np.sort(p.astype(np.int64) * 4 + (d + 1))
               for p, d in got[1]]
        results.append(out)
        assert len(out[1]) == 40, f"{name}: chromosome 2 lost"
    for a, b in zip(*results):
        assert np.array_equal(a, b)
    dense = stream_depth_dense(str(bam), DEF_MASK, chunk_bytes=2048)
    if dense is not None:
        per = list(dense[1])
        assert per[1][1] == 20  # 20 M-runs on c2


def test_event_stream_closes_inflater_on_abandon_and_error(tmp_path, bam):
    """Abandoning the generator or hitting a decode error must close the
    prefetching inflater (fd + producer thread), not leak it."""
    import threading

    from ngstpu.io.bam import DEF_MASK, stream_pileup_events

    base = threading.active_count()
    got = stream_pileup_events(bam, DEF_MASK, chunk_bytes=1 << 14)
    if got is None:
        pytest.skip("native library unavailable")
    g = got[1]
    next(g)        # start it
    g.close()      # abandon: finally must close the inflater
    data = open(bam, "rb").read()
    p = tmp_path / "cut.bam"
    p.write_bytes(data[:-37])
    got = stream_pileup_events(str(p), DEF_MASK, chunk_bytes=1 << 14)
    with pytest.raises(ValueError):
        list(got[1])
    # bad header path: _header_from_inflater closes before raising
    p2 = tmp_path / "junk.bam"
    p2.write_bytes(__import__("gzip").compress(b"JUNKJUNKJUNK"))
    with pytest.raises(ValueError):
        stream_pileup_events(str(p2), DEF_MASK)
    for _ in range(100):
        if threading.active_count() <= base:
            break
        import time
        time.sleep(0.05)
    assert threading.active_count() <= base + 1, "leaked producer threads"


def test_pooled_inflater_prefetch_equals_sync(tmp_path):
    """Property: the prefetching inflater reproduces the sync inflater's
    byte stream exactly over random BGZF files, chunk sizes and carries."""
    from ngstpu.io.bgzf import PooledInflater, compress_bgzf
    from ngstpu.io.native import get_lib

    if get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(31)
    for trial in range(6):
        n = int(rng.integers(0, 400000))
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        p = tmp_path / f"r{trial}.bgzf"
        p.write_bytes(compress_bgzf(data))
        for chunk in (1 << 12, 1 << 16, 1 << 22):
            outs = []
            for prefetch in (False, True):
                inf = PooledInflater(str(p), chunk, pool=f"pf{prefetch}",
                                     prefetch=prefetch)
                got = bytearray()
                carry = b""
                while True:
                    b = inf.next_chunk(carry)
                    if b is None:
                        got += bytes(carry)
                        break
                    # hold back a pseudo-random tail as the next carry
                    keep = int(rng.integers(0, min(len(b), 97) + 1))
                    got += bytes(b[:len(b) - keep])
                    carry = bytes(b[len(b) - keep:])
                inf.close()
                outs.append(bytes(got))
            assert outs[0] == outs[1] == data, (trial, chunk)


def test_event_mode_unsorted_advisory(tmp_path, capfd):
    """Interleaved tids on a big-genome BAM must log the coordinate-sort
    advisory in event mode (round-3 verdict item 7), and a pending-events
    total above NGSTPU_EVENT_PENDING_CAP must log the residency warning;
    outputs stay identical to the sorted grouping semantics."""
    import os

    from ngstpu.io.bam import stream_pileup_events
    from ngstpu.io.native import get_lib
    from ngstpu.testing.bamfixtures import encode_record, make_bam

    if get_lib() is None:
        pytest.skip("native library unavailable")
    seq = "ACGT" * 25
    recs = [encode_record("a", 0, 10, 30, "100M", seq),
            encode_record("b", 1, 20, 30, "100M", seq),
            encode_record("c", 0, 30, 30, "100M", seq)]  # tid goes back
    bam = tmp_path / "il.bam"
    make_bam(str(bam), [("c1", 80_000_000), ("c2", 80_000_000)], recs)

    os.environ["NGSTPU_EVENT_PENDING_CAP"] = "1"
    try:
        header, events = stream_pileup_events(str(bam), 0x704)
        got = [tuple(np.sort(p).tolist()) for p, d in events]
    finally:
        del os.environ["NGSTPU_EVENT_PENDING_CAP"]
    err = capfd.readouterr().err
    assert "not coordinate-grouped" in err
    assert "undischarged events" in err
    assert got[0] == (10, 30, 110, 130)  # both c1 reads despite interleave
    assert got[1] == (20, 120)


def test_prefetch1_closes_abandoned_source():
    """Abandoning a prefetch1 consumer mid-stream must close the inner
    generator promptly (its finally runs), even with the worker blocked
    on the full queue — the fd/thread leak of the round-3 advisory."""
    import threading
    import time

    from ngstpu.utils.iopipe import prefetch1

    closed = threading.Event()

    def source():
        try:
            for i in range(1000):
                yield i
        finally:
            closed.set()

    it = prefetch1(source())
    assert next(it) == 0
    it.close()  # abandon: worker is parked on q.put of a later item
    assert closed.wait(timeout=5.0), "inner generator was never closed"

    # exception path: a consumer error mid-loop must also release it
    closed2 = threading.Event()

    def source2():
        try:
            for i in range(1000):
                yield i
        finally:
            closed2.set()

    it2 = prefetch1(source2())
    next(it2)
    it2.close()
    assert closed2.wait(timeout=5.0)
    time.sleep(0)  # let worker threads finish quietly


def test_event_extraction_buffer_full_resume(tmp_path, monkeypatch):
    """The rc==3 capped-buffer path: with a tiny event capacity the
    extractor stops at record boundaries and resumes, and the emitted
    per-chromosome events are identical to an uncapped run."""
    from ngstpu.io.bam import DEF_MASK, stream_pileup_events
    from ngstpu.io.native import get_lib
    from ngstpu.testing.bamfixtures import encode_record, make_bam

    if get_lib() is None:
        pytest.skip("native library unavailable")
    seq = "ACGT" * 25
    recs = [encode_record(f"r{i}", i % 2, 10 + 3 * i, 30,
                          "40M5D30M2I28M", seq)  # 3 M-runs per record
            for i in range(60)]
    recs.sort(key=lambda r: r[0])  # keep encode order; tids interleave
    bam = tmp_path / "cap.bam"
    make_bam(str(bam), [("c1", 5000), ("c2", 5000)], recs)

    def collect():
        header, events = stream_pileup_events(str(bam), DEF_MASK)
        return [np.sort(p.astype(np.int64) * 4 + (d + 1)) for p, d in
                events]

    base = collect()
    monkeypatch.setenv("NGSTPU_EVENT_CAP", "7")  # > 3 ops/record, tiny
    capped = collect()
    monkeypatch.delenv("NGSTPU_EVENT_CAP")
    assert len(base) == len(capped) == 2
    for a, b in zip(base, capped):
        assert np.array_equal(a, b)
