import pytest

from ngstpu.testing.fixtures import random_fastq
from ngstpu.testing.oracles import run_oracle
from ngstpu.tools.cli import main as cli_main


def test_pipeline_outputs_match_individual_tools(tmp_path):
    data = random_fastq(600, read_len=100, seed=90, dup_frac=0.4)
    p = tmp_path / "in.fq"
    p.write_bytes(data)
    rc = cli_main(["pipeline", "-i", str(p), "-o", str(tmp_path / "pl"),
                   "-s", "0", "-e", "50"])
    assert rc == 0

    ref_t = run_oracle("fastq_trim", ["-i", str(p), "-s", "0", "-e", "50",
                                      "-o", str(tmp_path / "rt")], cwd=str(tmp_path))
    ref_u = run_oracle("gzfastq_uniq", ["-1", str(p), "-o",
                                        str(tmp_path / "ru")], cwd=str(tmp_path))
    ref_c = run_oracle("fastq_count", [str(p)], cwd=str(tmp_path))
    if None in (ref_t, ref_u, ref_c):
        pytest.skip("no C toolchain")
    assert (tmp_path / "pl.trim.fastq").read_bytes() == \
        (tmp_path / "rt.trim.fastq").read_bytes()
    assert (tmp_path / "pl_sortKeyUniq.fq").read_bytes() == \
        (tmp_path / "ru_sortKeyUniq.fq").read_bytes()
    count_row = (tmp_path / "pl.count.tsv").read_text()
    assert count_row.split("\t")[1:] == ref_c.stdout.decode().split("\t")[1:]


def test_pipeline_multifile(tmp_path):
    """Multi-lane mode: per-file output prefixes, one warm process."""
    from ngstpu.testing.fixtures import random_fastq

    p1, p2 = tmp_path / "l1.fq", tmp_path / "l2.fq"
    p1.write_bytes(random_fastq(300, read_len=50, seed=61, dup_frac=0.4))
    p2.write_bytes(random_fastq(200, read_len=50, seed=62, dup_frac=0.4))
    rc = cli_main(["pipeline", "-i", str(p1), "-i", str(p2),
                   "-o", str(tmp_path / "o"), "-e", "30"])
    assert rc == 0
    for k, p in ((1, p1), (2, p2)):
        base = tmp_path / f"o.{k}"
        assert (tmp_path / f"o.{k}.count.tsv").exists()
        trim = (tmp_path / f"o.{k}.trim.fastq").read_bytes()
        assert trim.count(b"\n") == (300 if k == 1 else 200) * 4
        u1 = (tmp_path / f"o.{k}_uniq.fq").read_bytes()
        u2 = (tmp_path / f"o.{k}_sortKeyUniq.fq").read_bytes()
        assert u1 == u2 and u1
