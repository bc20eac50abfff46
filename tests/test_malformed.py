"""Malformed-input behavior: clean CLI errors, never tracebacks.
(The reference C tools segfault or corrupt memory on several of these —
SURVEY.md §7; we fail with rc=1 and a message.)"""

import pytest

from ngstpu.tools.cli import main as cli_main


def test_fastq_wrong_line_count(tmp_path, capsys):
    p = tmp_path / "bad.fq"
    p.write_bytes(b"@r1\nACGT\n+\n")  # 3 lines
    rc = cli_main(["fastq_count", str(p)])
    assert rc == 1
    assert "invalid input" in capsys.readouterr().err


def test_bam_bad_magic(tmp_path, capsys):
    p = tmp_path / "bad.bam"
    p.write_bytes(b"\x00" * 100)
    rc = cli_main(["bam2depth", "-o", str(tmp_path / "o"), str(p)])
    assert rc == 1
    assert "invalid input" in capsys.readouterr().err


def test_mrle_bad_alphabet(tmp_path, capsys):
    p = tmp_path / "bad.fq"
    p.write_bytes(b"@r1\nACGT\n+\nIIII\n")  # 'I' outside the 6-symbol set
    rc = cli_main(["gzfastq_mrle", "-i", str(p), "-o", str(tmp_path / "o")])
    assert rc == 1
    assert "invalid input" in capsys.readouterr().err


def test_missing_file_clean(tmp_path, capsys):
    rc = cli_main(["fastq_trim", "-i", str(tmp_path / "nope.fq"),
                   "-o", str(tmp_path / "o")])
    assert rc == 1
