import os

import pytest

from ngstpu.testing.fixtures import gz, random_fastq
from ngstpu.testing.oracles import run_oracle
from ngstpu.tools.cli import main as cli_main


def test_kthread_parity(tmp_path):
    p1 = tmp_path / "a.fq"
    p2 = tmp_path / "b.fq.gz"
    p1.write_bytes(random_fastq(400, read_len=80, var_len=True, seed=70))
    p2.write_bytes(gz(random_fastq(250, read_len=60, seed=71)))

    ref_dir = tmp_path / "refcwd"
    ours_dir = tmp_path / "ourscwd"
    ref_dir.mkdir()
    ours_dir.mkdir()
    ref = run_oracle("fastq_count_kthread",
                     ["-H", "-L", "-t", "1", "-o", "merged.tsv",
                      str(p1), str(p2)], cwd=str(ref_dir))
    if ref is None:
        pytest.skip("no C toolchain")
    old = os.getcwd()
    os.chdir(ours_dir)
    try:
        rc = cli_main(["fastq_count_kthread", "-H", "-L", "-t", "1",
                       "-o", "merged.tsv", str(p1), str(p2)])
        assert rc == 0
    finally:
        os.chdir(old)
    ref_files = sorted(os.listdir(ref_dir))
    ours_files = sorted(os.listdir(ours_dir))
    assert ref_files == ours_files
    for f in ref_files:
        assert (ours_dir / f).read_bytes() == (ref_dir / f).read_bytes(), f
