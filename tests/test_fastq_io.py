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
