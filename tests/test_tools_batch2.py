import gzip
import os

import numpy as np
import pytest

from ngstpu.testing.fixtures import gz, random_fastq
from ngstpu.testing.oracles import run_oracle
from ngstpu.tools.cli import main as cli_main


def _gunzip(p):
    with gzip.open(p, "rb") as f:
        return f.read()


def _records(data: bytes):
    lines = data.decode().splitlines()
    assert len(lines) % 4 == 0
    return sorted(tuple(lines[i:i + 4]) for i in range(0, len(lines), 4))


# ---------------- gzfastq_uniq_sort ----------------

def test_uniq_sort_se(tmp_path):
    data = random_fastq(800, read_len=60, seed=60, dup_frac=0.5)
    p = tmp_path / "in.fq"
    p.write_bytes(data)
    ref = run_oracle("gzfastq_uniq_sort", ["-1", str(p), "-o",
                                           str(tmp_path / "ref")], cwd=str(tmp_path))
    if ref is None:
        pytest.skip("no C toolchain")
    rc = cli_main(["gzfastq_uniq_sort", "-1", str(p), "-o", str(tmp_path / "ours")])
    assert rc == 0
    assert _records(_gunzip(tmp_path / "ours_1_uniq.fq.gz")) == \
        _records(_gunzip(tmp_path / "ref_1_uniq.fq.gz"))


def test_uniq_sort_pe(tmp_path):
    r1 = random_fastq(500, read_len=40, seed=61, name_prefix="pp")
    r2 = random_fastq(500, read_len=40, seed=62, name_prefix="pp")
    def dup(d, k):
        recs = d.split(b"\n")
        recs = [b"\n".join(recs[i:i + 4]) for i in range(0, len(recs) - 1, 4)]
        return b"\n".join(recs + recs[:k]) + b"\n"
    p1 = tmp_path / "r1.fq"
    p2 = tmp_path / "r2.fq"
    p1.write_bytes(dup(r1, 150))
    p2.write_bytes(dup(r2, 150))
    ref = run_oracle("gzfastq_uniq_sort", ["-1", str(p1), "-2", str(p2), "-o",
                                           str(tmp_path / "ref")], cwd=str(tmp_path))
    if ref is None:
        pytest.skip("no C toolchain")
    cli_main(["gzfastq_uniq_sort", "-1", str(p1), "-2", str(p2), "-o",
              str(tmp_path / "ours")])
    for mate in ("_1_uniq.fq.gz", "_2_uniq.fq.gz"):
        assert _records(_gunzip(tmp_path / ("ours" + mate))) == \
            _records(_gunzip(tmp_path / ("ref" + mate)))


# ---------------- gzfastq_uniqQ ----------------

def test_uniqq_sort_by_seq(tmp_path):
    data = random_fastq(600, read_len=50, seed=63, dup_frac=0.6)
    p = tmp_path / "in.fq"
    p.write_bytes(data)
    ref = run_oracle("gzfastq_uniqQ", ["-1", str(p), "-S", "-o",
                                       str(tmp_path / "ref")], cwd=str(tmp_path))
    if ref is None:
        pytest.skip("no C toolchain")
    rc = cli_main(["gzfastq_uniqQ", "-1", str(p), "-S", "-o", str(tmp_path / "ours")])
    assert rc == 0
    assert (tmp_path / "ours_sortKeyUniq.fq").read_bytes() == \
        (tmp_path / "ref_sortKeyUniq.fq").read_bytes()


# ---------------- pick_pair ----------------

def test_pick_pair(tmp_path):
    # name-sorted files with partial overlap
    def fq(ids, seed):
        rng = np.random.default_rng(seed)
        out = []
        for i in ids:
            seq = "".join(rng.choice(list("ACGT"), 30))
            qual = "".join(chr(int(c)) for c in rng.integers(35, 70, 30))
            out.append(f"@pp_{i:05d} c/{seed}\n{seq}\n+\n{qual}\n")
        return "".join(out).encode()
    ids1 = sorted(set(range(0, 300, 2)) | set(range(100, 200)))
    ids2 = sorted(set(range(0, 300, 3)) | set(range(100, 200)))
    p1 = tmp_path / "a1.fq"
    p2 = tmp_path / "a2.fq"
    p1.write_bytes(fq(ids1, 1))
    p2.write_bytes(fq(ids2, 2))
    ref = run_oracle("pick_pair", ["-1", str(p1), "-2", str(p2), "-o",
                                   str(tmp_path / "ref")], cwd=str(tmp_path))
    if ref is None:
        pytest.skip("no C toolchain")
    rc = cli_main(["pick_pair", "-1", str(p1), "-2", str(p2), "-o",
                   str(tmp_path / "ours")])
    assert rc == 0
    for sfx in ("_1_PE.fq.gz", "_2_PE.fq.gz", "_1_SE.fq.gz", "_2_SE.fq.gz"):
        assert _gunzip(tmp_path / ("ours" + sfx)) == \
            _gunzip(tmp_path / ("ref" + sfx)), sfx


# ---------------- fastq2twobit / twoBit2seq ----------------

def test_twobit_roundtrip_parity(tmp_path):
    data = random_fastq(200, read_len=73, seed=64, with_n=True)
    p = tmp_path / "in.fq"
    p.write_bytes(data)
    ref = run_oracle("fastq2twobit", ["-i", str(p), "-o", str(tmp_path / "ref")],
                     cwd=str(tmp_path))
    if ref is None:
        pytest.skip("no C toolchain")
    rc = cli_main(["fastq2twobit", "-i", str(p), "-o", str(tmp_path / "ours")])
    assert rc == 0
    ours_bin = (tmp_path / "ours_sort_by_seq.fq").read_bytes()
    ref_bin = (tmp_path / "ref_sort_by_seq.fq").read_bytes()
    assert ours_bin == ref_bin

    ref2 = run_oracle("twoBit2seq", ["-i", str(tmp_path / "ref_sort_by_seq.fq"),
                                     "-o", str(tmp_path / "refseq")],
                      cwd=str(tmp_path))
    if ref2 is None:
        pytest.skip("no C toolchain")
    rc = cli_main(["twoBit2seq", "-i", str(tmp_path / "ours_sort_by_seq.fq"),
                   "-o", str(tmp_path / "oursseq")])
    assert rc == 0
    assert (tmp_path / "oursseq.decompress").read_bytes() == \
        (tmp_path / "refseq.decompress").read_bytes()


# ---------------- gzfastq_mrle ----------------

def test_mrle_parity(tmp_path):
    data = random_fastq(150, read_len=80, seed=65, qual_alphabet=b"#/7<BF")
    p = tmp_path / "in.fq"
    p.write_bytes(data)
    ref = run_oracle("gzfastq_mrle", ["-i", str(p), "-o", str(tmp_path / "ref")],
                     cwd=str(tmp_path))
    if ref is None:
        pytest.skip("no C toolchain")
    import contextlib, io
    rc = cli_main(["gzfastq_mrle", "-i", str(p), "-o", str(tmp_path / "ours")])
    assert rc == 0
    assert (tmp_path / "ours_sort_by_seq.fq").read_bytes() == \
        (tmp_path / "ref_sort_by_seq.fq").read_bytes()


def test_mrle_long_runs(tmp_path):
    # quality strings with runs > 255 exercise the 255-continuation bytes
    q = b"F" * 300 + b"#" * 10 + b"/" * 256 + b"<B" * 5
    seq = b"A" * len(q)
    data = b"@r1\n" + seq + b"\n+\n" + q + b"\n"
    p = tmp_path / "in.fq"
    p.write_bytes(data)
    ref = run_oracle("gzfastq_mrle", ["-i", str(p), "-o", str(tmp_path / "ref")],
                     cwd=str(tmp_path))
    if ref is None:
        pytest.skip("no C toolchain")
    import io as _io, contextlib
    buf_path = tmp_path / "ours"
    rc = cli_main(["gzfastq_mrle", "-i", str(p), "-o", str(buf_path)])
    assert rc == 0
    assert (tmp_path / "ours_sort_by_seq.fq").read_bytes() == \
        (tmp_path / "ref_sort_by_seq.fq").read_bytes()
