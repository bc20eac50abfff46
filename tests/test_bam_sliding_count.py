import os

import pytest

from ngstpu.testing.bamfixtures import index_bam, random_bam
from ngstpu.testing.oracles import run_oracle
from ngstpu.tools.cli import main as cli_main

REFS = [("chr1", 120000), ("chr2", 61000)]


def test_sliding_count_parity(tmp_path):
    bam = str(tmp_path / "s.bam")
    random_bam(bam, REFS, n_reads=3000, seed=11, read_len=80)
    if not index_bam(bam):
        pytest.skip("no samtools")
    ref_dir = tmp_path / "ref"
    ours_dir = tmp_path / "ours"
    ref_dir.mkdir()
    ours_dir.mkdir()
    ref = run_oracle("bam_sliding_count", ["-o", "o", "-w", "5000", bam],
                     cwd=str(ref_dir))
    if ref is None:
        pytest.skip("no C toolchain")
    assert ref.returncode == 0, ref.stderr.decode()[:500]
    old = os.getcwd()
    os.chdir(ours_dir)
    try:
        rc = cli_main(["bam_sliding_count", "-o", "o", "-w", "5000", bam])
        assert rc == 0
    finally:
        os.chdir(old)
    assert (ours_dir / "o.txt").read_bytes() == (ref_dir / "o.txt").read_bytes()
    # our PNG exists and is a valid PNG
    png = ours_dir / (os.path.basename(bam) + "_hits.png")
    # reference writes {full_path}_hits.png next to the bam; ours too
    pngs = [p for p in [png, tmp_path / "s.bam_hits.png"] if p.exists()]
    assert pngs and pngs[0].read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"


def test_sliding_count_region_mode(tmp_path):
    bam = str(tmp_path / "r.bam")
    random_bam(bam, REFS, n_reads=2000, seed=12, read_len=80)
    if not index_bam(bam):
        pytest.skip("no samtools")
    ref_dir = tmp_path / "ref"
    ours_dir = tmp_path / "ours"
    ref_dir.mkdir()
    ours_dir.mkdir()
    region = "chr1:20000-90000"
    ref = run_oracle("bam_sliding_count",
                     ["-o", "o", "-w", "5000", "-r", region, bam],
                     cwd=str(ref_dir))
    if ref is None:
        pytest.skip("no C toolchain")
    assert ref.returncode == 0, ref.stderr.decode()[:300]
    old = os.getcwd()
    os.chdir(ours_dir)
    try:
        import io, contextlib
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = cli_main(["bam_sliding_count", "-o", "o", "-w", "5000",
                           "-r", region, bam])
        assert rc == 0
    finally:
        os.chdir(old)
    assert (ours_dir / "o.txt").read_bytes() == (ref_dir / "o.txt").read_bytes()
    assert buf.getvalue() == ref.stdout.decode()
