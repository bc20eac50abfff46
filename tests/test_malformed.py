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


def test_truncated_gzip_clean(tmp_path, capsys):
    import gzip

    from ngstpu.testing.fixtures import random_fastq

    p = tmp_path / "t.fq.gz"
    full = gzip.compress(random_fastq(200, read_len=60, seed=1))
    p.write_bytes(full[: len(full) // 2])  # truncated mid-stream
    rc = cli_main(["fastq_count", str(p)])
    assert rc == 1
    assert "invalid input" in capsys.readouterr().err


def test_truncated_bgzf_bam_clean(tmp_path, capsys):
    from ngstpu.testing.bamfixtures import random_bam

    bam = tmp_path / "t.bam"
    random_bam(str(bam), [("c1", 50000)], 500, seed=2)
    data = bam.read_bytes()
    bam.write_bytes(data[: len(data) * 2 // 3])
    rc = cli_main(["bam2wig", "-o", str(tmp_path / "o"), str(bam)])
    assert rc == 1
    assert "invalid input" in capsys.readouterr().err


def test_binary_garbage_fastq_clean(tmp_path, capsys):
    import numpy as np

    p = tmp_path / "g.fq"
    rng = np.random.default_rng(3)
    p.write_bytes(rng.integers(0, 256, 10000, dtype=np.uint8).tobytes())
    rc = cli_main(["gzfastq_sort", "-s", "-i", str(p),
                   "-o", str(tmp_path / "o")])
    assert rc == 1


def test_fuzz_parser_never_crashes(tmp_path):
    """Property fuzz: random mutations of a valid FASTQ either parse to
    whole records or raise ValueError — never crash or mis-shape."""
    import numpy as np

    from ngstpu.io import native
    from ngstpu.testing.fixtures import random_fastq

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    base = bytearray(random_fastq(300, read_len=60, var_len=True, seed=4))
    rng = np.random.default_rng(5)
    for trial in range(60):
        buf = bytearray(base)
        for _ in range(int(rng.integers(1, 6))):
            op = rng.integers(0, 3)
            pos = int(rng.integers(0, len(buf)))
            if op == 0:
                buf[pos] = int(rng.integers(0, 256))
            elif op == 1:
                del buf[pos]
            else:
                buf.insert(pos, int(rng.integers(0, 256)))
        if not bytes(buf).endswith(b"\n"):
            buf += b"\n"
        data = np.frombuffer(bytes(buf), np.uint8)
        try:
            out = native.parse_fastq_chunk(data, 128, frozenset(("seq", "qual", "names")))
        except ValueError:
            continue
        seq, qual, lens, names, nstarts, nlens = out
        b = len(lens)
        n_lines = bytes(buf).count(b"\n")
        assert b == n_lines // 4
        assert seq.shape[0] == b and qual.shape[0] == b
        if b:
            assert int(nstarts[-1]) + int(nlens[-1]) == len(names)
            assert (lens >= 0).all() and (lens <= seq.shape[1]).all()
