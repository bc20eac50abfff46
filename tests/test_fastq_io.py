import gzip
import io

import numpy as np
import pytest

from ngstpu.io.fastq import FastqChunkReader, format_fastq
from ngstpu.testing.fixtures import gz, random_fastq


def _all_batches(path):
    return list(FastqChunkReader(path))


def test_parse_roundtrip(tmp_path):
    data = random_fastq(500, read_len=100, var_len=True, with_comment=True, seed=1)
    p = tmp_path / "a.fq"
    p.write_bytes(data)
    batches = _all_batches(str(p))
    n = sum(b.n for b in batches)
    assert n == 500
    # reconstruct text and compare
    out = b"".join(
        format_fastq(b.names, b.name_starts, b.name_lens, b.seq, b.qual, b.lens)
        for b in batches)
    assert out == data


def test_parse_gzip(tmp_path):
    data = random_fastq(100, read_len=60, seed=2)
    p = tmp_path / "a.fq.gz"
    p.write_bytes(gz(data))
    batches = _all_batches(str(p))
    assert sum(b.n for b in batches) == 100
    b = batches[0]
    assert b.name(0) == b"@read_0"
    assert len(b.seq_bytes(0)) == 60


def test_chunk_boundaries(tmp_path):
    data = random_fastq(101, read_len=80, var_len=True, seed=3)
    p = tmp_path / "a.fq"
    p.write_bytes(data)
    batches = list(FastqChunkReader(str(p), chunk_bytes=1000))
    assert sum(b.n for b in batches) == 101
    out = b"".join(
        format_fastq(b.names, b.name_starts, b.name_lens, b.seq, b.qual, b.lens)
        for b in batches)
    assert out == data


def test_missing_final_newline(tmp_path):
    data = random_fastq(10, read_len=50, seed=4).rstrip(b"\n")
    p = tmp_path / "a.fq"
    p.write_bytes(data)
    assert sum(b.n for b in _all_batches(str(p))) == 10


def test_padding_and_lens(tmp_path):
    data = random_fastq(64, read_len=100, var_len=True, min_len=10, seed=5)
    p = tmp_path / "a.fq"
    p.write_bytes(data)
    b = _all_batches(str(p))[0]
    assert b.seq.shape[1] % 128 == 0
    col = np.arange(b.seq.shape[1])
    pad_mask = col[None, :] >= b.lens[:, None]
    assert (b.seq[pad_mask] == 0).all()


def test_fused_parser_matches_fallback():
    """Differential: the fused native parser (ngs_fastq_scan/fill) must agree
    with the pure-numpy pipeline on ragged records, across thread-boundary
    fixups (multi-MB input) and every `need` subset."""
    from ngstpu.io import native
    import ngstpu.io.fastq as fq

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    recs = []
    for i in range(40000):
        L = int(rng.integers(1, 150))
        s = rng.choice(np.frombuffer(b"ACGTN", np.uint8), L)
        q = rng.integers(33, 74, L).astype(np.uint8)
        nm = f"@r{i} x{int(rng.integers(0, 10))}".encode()
        recs.append(nm + b"\n" + s.tobytes() + b"\n+\n" + q.tobytes() + b"\n")
    data = np.frombuffer(b"".join(recs), np.uint8)
    real = native.parse_fastq_chunk
    try:
        for need in (frozenset(("seq", "qual", "names")), frozenset(("qual",)),
                     frozenset(("seq",))):
            native.parse_fastq_chunk = lambda *a, **k: None
            legacy = fq._parse_chunk(data, False, 128, need)
            native.parse_fastq_chunk = real
            seq, qual, lens, names, nstarts, nlens = real(data, 128, need)
            assert np.array_equal(legacy.lens, lens)
            assert np.array_equal(legacy.seq, seq)
            assert np.array_equal(legacy.qual, qual)
            assert np.array_equal(legacy.names, names)
            assert np.array_equal(legacy.name_starts, nstarts)
            assert np.array_equal(legacy.name_lens, nlens)
    finally:
        native.parse_fastq_chunk = real
    with pytest.raises(ValueError):
        real(np.frombuffer(b"@a\nAC\n+\n", np.uint8), 128, frozenset(("seq",)))


def test_parallel_gzip_writer_multimember(tmp_path):
    """Concatenated independent members decompress to the exact payload
    through both the gzip module and a streaming zlib reader."""
    import gzip
    import zlib

    import numpy as np

    from ngstpu.io.stream import ParallelGzipWriter

    rng = np.random.default_rng(0)
    payload = bytes(rng.integers(32, 127, 9 << 20).astype(np.uint8))
    p = tmp_path / "mm.gz"
    with ParallelGzipWriter(open(p, "wb")) as w:
        for lo in range(0, len(payload), 1 << 20):
            w.write(payload[lo:lo + (1 << 20)])
    with gzip.open(p, "rb") as f:
        assert f.read() == payload
    # streaming multi-member decode (the way our own readers consume gz)
    data = p.read_bytes()
    out, o = [], 0
    while o < len(data):
        d = zlib.decompressobj(16 + 15)
        out.append(d.decompress(data[o:]))
        o = len(data) - len(d.unused_data)
    assert b"".join(out) == payload
