import gzip
import os
import subprocess

import numpy as np
import pytest

from ngstpu.testing.fixtures import gz, random_fastq, random_fastq_pair
from ngstpu.testing.oracles import run_oracle
from ngstpu.tools.cli import main as cli_main


def _gunzip(p):
    with gzip.open(p, "rb") as f:
        return f.read()


# ---------------- fastq_trim ----------------

@pytest.mark.parametrize("s,e", [(0, 50), (10, 70), (0, 400), (90, 120)])
def test_trim_parity(tmp_path, s, e):
    data = random_fastq(400, read_len=100, var_len=True, seed=20 + s + e)
    p = tmp_path / "in.fq"
    p.write_bytes(data)
    ref = run_oracle("fastq_trim", ["-i", str(p), "-s", str(s), "-e", str(e),
                                    "-o", str(tmp_path / "ref")], cwd=str(tmp_path))
    if ref is None:
        pytest.skip("no C toolchain")
    rc = cli_main(["fastq_trim", "-i", str(p), "-s", str(s), "-e", str(e),
                   "-o", str(tmp_path / "ours")])
    assert rc == 0
    assert (tmp_path / "ours.trim.fastq").read_bytes() == \
        (tmp_path / "ref.trim.fastq").read_bytes()


def test_trim_gzip_input(tmp_path):
    data = random_fastq(100, read_len=80, seed=31)
    p = tmp_path / "in.fq.gz"
    p.write_bytes(gz(data))
    ref = run_oracle("fastq_trim", ["-i", str(p), "-e", "40",
                                    "-o", str(tmp_path / "ref")], cwd=str(tmp_path))
    if ref is None:
        pytest.skip("no C toolchain")
    cli_main(["fastq_trim", "-i", str(p), "-e", "40", "-o", str(tmp_path / "ours")])
    assert (tmp_path / "ours.trim.fastq").read_bytes() == \
        (tmp_path / "ref.trim.fastq").read_bytes()


# ---------------- gzfastq_sample ----------------

def _run_sample_both(tmp_path, args_in, infile_names):
    """Run C oracle and ours in separate cwds, return decompressed outputs."""
    ref_dir = tmp_path / "refcwd"
    ours_dir = tmp_path / "ourscwd"
    ref_dir.mkdir(exist_ok=True)
    ours_dir.mkdir(exist_ok=True)
    ref = run_oracle("gzfastq_sample", args_in, cwd=str(ref_dir))
    if ref is None:
        pytest.skip("no C toolchain")
    old = os.getcwd()
    os.chdir(ours_dir)
    try:
        rc = cli_main(["gzfastq_sample"] + args_in)
        assert rc == 0
    finally:
        os.chdir(old)
    ref_outs = sorted(os.listdir(ref_dir))
    ours_outs = sorted(os.listdir(ours_dir))
    assert ref_outs == ours_outs, (ref_outs, ours_outs)
    return [( _gunzip(ref_dir / f), _gunzip(ours_dir / f)) for f in ref_outs]


def test_sample_n_mode_se(tmp_path):
    p = tmp_path / "se.fq.gz"
    p.write_bytes(gz(random_fastq(1000, read_len=60, seed=40)))
    for ref_out, ours_out in _run_sample_both(tmp_path, ["-1", str(p), "-n", "100"], [p]):
        assert ours_out == ref_out


def test_sample_n_mode_pe(tmp_path):
    r1, r2 = random_fastq_pair(500, read_len=50, seed=41)
    p1 = tmp_path / "r1.fq.gz"
    p2 = tmp_path / "r2.fq.gz"
    p1.write_bytes(gz(r1))
    p2.write_bytes(gz(r2))
    for ref_out, ours_out in _run_sample_both(
            tmp_path, ["-1", str(p1), "-2", str(p2), "-n", "77"], [p1, p2]):
        assert ours_out == ref_out


def test_sample_s_mode_no_seed(tmp_path):
    p = tmp_path / "se.fq.gz"
    p.write_bytes(gz(random_fastq(1000, read_len=60, seed=42, with_comment=True)))
    for ref_out, ours_out in _run_sample_both(tmp_path, ["-1", str(p), "-s", "0.37"], [p]):
        assert ours_out == ref_out


def test_sample_s_mode_with_seed(tmp_path):
    p = tmp_path / "se.fq.gz"
    p.write_bytes(gz(random_fastq(800, read_len=40, seed=43)))
    for ref_out, ours_out in _run_sample_both(tmp_path, ["-1", str(p), "-s", "7.25"], [p]):
        assert ours_out == ref_out


def test_sample_fasta_mode(tmp_path):
    p = tmp_path / "se.fq.gz"
    p.write_bytes(gz(random_fastq(300, read_len=30, seed=44)))
    for ref_out, ours_out in _run_sample_both(
            tmp_path, ["-1", str(p), "-n", "50", "-f"], [p]):
        assert ours_out == ref_out
