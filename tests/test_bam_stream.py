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
