import os

import numpy as np
import pytest

from ngstpu.testing.fixtures import gz, random_fastq, random_fastq_pair
from ngstpu.testing.oracles import run_oracle
from ngstpu.tools.cli import main as cli_main


def _records(data: bytes):
    """FASTQ text -> multiset of 4-line records."""
    lines = data.decode().splitlines()
    assert len(lines) % 4 == 0
    return sorted(tuple(lines[i:i + 4]) for i in range(0, len(lines), 4))


# ---------------- gzfastq_sort ----------------

@pytest.mark.parametrize("flag,suffix", [("-s", "_sort_by_seq.fq"),
                                         ("-n", "_sort_by_name.fq")])
def test_sort_parity(tmp_path, flag, suffix):
    data = random_fastq(800, read_len=90, var_len=True, seed=50,
                        with_comment=True, dup_frac=0.3)
    p = tmp_path / "in.fq"
    p.write_bytes(data)
    ref = run_oracle("gzfastq_sort", ["-i", str(p), flag, "-o",
                                      str(tmp_path / "ref")], cwd=str(tmp_path))
    if ref is None:
        pytest.skip("no C toolchain")
    rc = cli_main(["gzfastq_sort", "-i", str(p), flag, "-o",
                   str(tmp_path / "ours")])
    assert rc == 0
    ours = (tmp_path / ("ours" + suffix)).read_bytes()
    refd = (tmp_path / ("ref" + suffix)).read_bytes()
    assert ours == refd


def test_sort_gzip_default_mode(tmp_path):
    data = random_fastq(300, read_len=60, seed=51, dup_frac=0.5)
    p = tmp_path / "in.fq.gz"
    p.write_bytes(gz(data))
    ref = run_oracle("gzfastq_sort", ["-i", str(p), "-o",
                                      str(tmp_path / "ref")], cwd=str(tmp_path))
    if ref is None:
        pytest.skip("no C toolchain")
    cli_main(["gzfastq_sort", "-i", str(p), "-o", str(tmp_path / "ours")])
    assert (tmp_path / "ours_sort_by_seq.fq").read_bytes() == \
        (tmp_path / "ref_sort_by_seq.fq").read_bytes()


# ---------------- gzfastq_uniq ----------------

def test_uniq_se_parity(tmp_path):
    data = random_fastq(1000, read_len=70, seed=52, dup_frac=0.6)
    p = tmp_path / "in.fq"
    p.write_bytes(data)
    ref = run_oracle("gzfastq_uniq", ["-1", str(p), "-o",
                                      str(tmp_path / "ref")], cwd=str(tmp_path))
    if ref is None:
        pytest.skip("no C toolchain")
    rc = cli_main(["gzfastq_uniq", "-1", str(p), "-o", str(tmp_path / "ours")])
    assert rc == 0
    # sorted-key dump must be byte-identical
    assert (tmp_path / "ours_sortKeyUniq.fq").read_bytes() == \
        (tmp_path / "ref_sortKeyUniq.fq").read_bytes()
    # main output: record multiset identical (ref order is dict-internal)
    assert _records((tmp_path / "ours_uniq.fq").read_bytes()) == \
        _records((tmp_path / "ref_uniq.fq").read_bytes())


def test_uniq_se_varlen(tmp_path):
    data = random_fastq(500, read_len=80, var_len=True, min_len=20, seed=53,
                        dup_frac=0.4, with_comment=True)
    p = tmp_path / "in.fq"
    p.write_bytes(data)
    ref = run_oracle("gzfastq_uniq", ["-1", str(p), "-o",
                                      str(tmp_path / "ref")], cwd=str(tmp_path))
    if ref is None:
        pytest.skip("no C toolchain")
    cli_main(["gzfastq_uniq", "-1", str(p), "-o", str(tmp_path / "ours")])
    assert (tmp_path / "ours_sortKeyUniq.fq").read_bytes() == \
        (tmp_path / "ref_sortKeyUniq.fq").read_bytes()


def test_uniq_pe_parity(tmp_path):
    r1, r2 = random_fastq_pair(600, read_len=50, seed=54)
    # inject duplicates pairwise: repeat whole records in both files
    def dup(data):
        recs = data.split(b"\n")
        recs = [b"\n".join(recs[i:i + 4]) for i in range(0, len(recs) - 1, 4)]
        recs = recs + recs[:200]
        return b"\n".join(recs) + b"\n"
    p1 = tmp_path / "r1.fq"
    p2 = tmp_path / "r2.fq"
    p1.write_bytes(dup(r1))
    p2.write_bytes(dup(r2))
    ref = run_oracle("gzfastq_uniq", ["-1", str(p1), "-2", str(p2), "-o",
                                      str(tmp_path / "ref")], cwd=str(tmp_path))
    if ref is None:
        pytest.skip("no C toolchain")
    rc = cli_main(["gzfastq_uniq", "-1", str(p1), "-2", str(p2), "-o",
                   str(tmp_path / "ours")])
    assert rc == 0
    for mate in ("_1_uniq.fq", "_2_uniq.fq"):
        assert _records((tmp_path / ("ours" + mate)).read_bytes()) == \
            _records((tmp_path / ("ref" + mate)).read_bytes())


def test_host_dedup_spill_path_matches_device(tmp_path, monkeypatch):
    """Force the >HBM host lexsort fallback and compare with device dedup."""
    import jax.numpy as jnp
    import numpy as np
    from ngstpu.ops import sortengine

    rng = np.random.default_rng(5)
    B = 2048
    words = rng.integers(0, 50, (B, 3)).astype(np.uint32)
    lens = rng.integers(10, 30, B).astype(np.int32)
    sumq = rng.integers(0, 3000, B).astype(np.uint32)
    g_dev = sortengine.dedup_groups(jnp.asarray(words), jnp.asarray(lens),
                                    jnp.asarray(sumq), B)
    monkeypatch.setattr(sortengine, "DEVICE_DEDUP_LIMIT", 1)
    g_host = sortengine.dedup_groups(jnp.asarray(words), jnp.asarray(lens),
                                     jnp.asarray(sumq), B)
    assert (g_dev["perm"] == g_host["perm"]).all()
    assert (g_dev["counts"] == g_host["counts"]).all()
    assert (g_dev["rep"] == g_host["rep"]).all()


def test_uniq_mesh_bit_identical(tmp_path):
    """gzfastq_uniq -m N (distributed dedup over the dp mesh) must produce
    byte-identical output files to the single-chip run."""
    data = random_fastq(3000, read_len=80, var_len=True, seed=77,
                        dup_frac=0.5)
    p = tmp_path / "in.fq"
    p.write_bytes(data)
    rc = cli_main(["gzfastq_uniq", "-1", str(p), "-o", str(tmp_path / "one")])
    assert rc == 0
    rc = cli_main(["gzfastq_uniq", "-1", str(p), "-o", str(tmp_path / "mesh"),
                   "-m", "8"])
    assert rc == 0
    assert (tmp_path / "one_uniq.fq").read_bytes() == \
        (tmp_path / "mesh_uniq.fq").read_bytes()
    assert (tmp_path / "one_sortKeyUniq.fq").read_bytes() == \
        (tmp_path / "mesh_sortKeyUniq.fq").read_bytes()


def test_uniq_mesh_pe_bit_identical(tmp_path):
    d1, d2 = random_fastq_pair(2000, read_len=60, seed=78, dup_frac=0.4)
    p1, p2 = tmp_path / "r1.fq", tmp_path / "r2.fq"
    p1.write_bytes(d1)
    p2.write_bytes(d2)
    cli_main(["gzfastq_uniq", "-1", str(p1), "-2", str(p2), "-o",
              str(tmp_path / "one")])
    cli_main(["gzfastq_uniq", "-1", str(p1), "-2", str(p2), "-o",
              str(tmp_path / "mesh"), "-m", "4"])
    for suf in ("_1_uniq.fq", "_2_uniq.fq"):
        assert (tmp_path / ("one" + suf)).read_bytes() == \
            (tmp_path / ("mesh" + suf)).read_bytes()


def test_sort_mesh_bit_identical(tmp_path):
    """gzfastq_sort -m N (splitter-based distributed sample sort) must be
    byte-identical to the single-chip sort, for both comparators."""
    data = random_fastq(4000, read_len=70, var_len=True, seed=79,
                        dup_frac=0.4, with_comment=True)
    p = tmp_path / "in.fq"
    p.write_bytes(data)
    for flag, suffix in (("-s", "_sort_by_seq.fq"), ("-n", "_sort_by_name.fq")):
        cli_main(["gzfastq_sort", "-i", str(p), flag, "-o",
                  str(tmp_path / "one")])
        cli_main(["gzfastq_sort", "-i", str(p), flag, "-o",
                  str(tmp_path / "mesh"), "-m", "8"])
        assert (tmp_path / ("one" + suffix)).read_bytes() == \
            (tmp_path / ("mesh" + suffix)).read_bytes(), flag


def test_ordered_uniq_rank_semantics(tmp_path):
    """ordered_uniq = the kbtree/skiplist/map demo capability: in-order
    unique dump with 1-based ranks; rank_of is the inverse query."""
    from ngstpu.tools.ordered_uniq import rank_of

    data = random_fastq(500, read_len=40, seed=90, dup_frac=0.6)
    p = tmp_path / "in.fq"
    p.write_bytes(data)
    rc = cli_main(["ordered_uniq", "-i", str(p), "-o", str(tmp_path / "o.fq")])
    assert rc == 0
    lines = (tmp_path / "o.fq").read_bytes().splitlines()
    assert len(lines) % 4 == 0
    seqs = [lines[i + 1] for i in range(0, len(lines), 4)]
    ranks = [int(lines[i].rsplit(b"\t", 1)[1]) for i in range(0, len(lines), 4)]
    assert seqs == sorted(set(seqs))          # key order, unique
    assert ranks == list(range(1, len(seqs) + 1))
    # select-by-rank == row; rank_of == inverse (skiplist_kseq.c:96-107)
    assert rank_of(seqs, seqs[3]) == 4
    assert rank_of(seqs, b"ZZZZ") == 0
    # -r K cap (the demo prints ranks 1..20)
    rc = cli_main(["ordered_uniq", "-i", str(p), "-r", "5",
                   "-o", str(tmp_path / "r.fq")])
    assert rc == 0
    top = (tmp_path / "r.fq").read_bytes().splitlines()
    assert len(top) == 20 and top[1] == seqs[0]


# ---------------- 2-bit packing path ----------------

def test_classify_alphabet():
    from ngstpu.ops import sortengine as se

    acgt = np.frombuffer(b"ACGTACGT" + b"\x00" * 8, np.uint8).reshape(2, 8)
    assert se.classify_alphabet(acgt) == "dna2"
    withn = np.frombuffer(b"ACGNACGT" + b"\x00" * 8, np.uint8).reshape(2, 8)
    assert se.classify_alphabet(withn) == "dna3"
    raw = np.frombuffer(b"ACGXACGT" + b"\x00" * 8, np.uint8).reshape(2, 8)
    assert se.classify_alphabet(raw) == "raw"


def test_dna2_words_native_matches_jax():
    from ngstpu.io import native
    from ngstpu.ops import sortengine as se

    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(60)
    for L in (16, 31, 32, 50, 100):
        seq = np.frombuffer(
            np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, 64 * L)]
            .tobytes(), np.uint8).reshape(64, L).copy()
        lens = rng.integers(0, L + 1, 64).astype(np.int32)
        cols = np.arange(L)[None, :]
        seq[cols >= lens[:, None]] = 0  # zero padding like the parser
        want = np.asarray(se.dna2_words(seq))
        got = se.pack_words_host(seq, "dna2")
        np.testing.assert_array_equal(got, want)


def test_dna2_dedup_matches_raw_packing_prefix_collisions():
    """2-bit words alias padding with 'A'; the explicit length key must
    keep groups exact and order byte-lexicographic — exercised on a set
    dense in A-prefix collisions ('AA', 'AAA', 'AAAA', 'AAAAC', ...)."""
    import jax.numpy as jnp

    from ngstpu.ops import sortengine as se

    seqs = [b"AA", b"AAA", b"AAAA", b"AAAAC", b"AAAC", b"AACA", b"AA",
            b"AAAA", b"CAAA", b"AAAAA", b"A", b"AAAT", b"AAAG", b"AAA"]
    L = 32
    B = len(seqs)
    padded = np.zeros((B, L), np.uint8)
    lens = np.zeros(B, np.int32)
    for i, s in enumerate(seqs):
        padded[i, :len(s)] = np.frombuffer(s, np.uint8)
        lens[i] = len(s)
    sumq = np.arange(B, dtype=np.uint32)[::-1].copy()

    w2, enc2 = se.pack_for_dedup(padded, kind="dna2")
    assert not enc2
    g2 = se.dedup_groups(w2, jnp.asarray(lens), jnp.asarray(sumq), B,
                         words_encode_len=enc2)
    wr = se.bytes_to_words(jnp.asarray(padded))
    gr = se.dedup_groups(wr, jnp.asarray(lens), jnp.asarray(sumq), B)
    np.testing.assert_array_equal(g2["perm"], gr["perm"])
    np.testing.assert_array_equal(g2["counts"], gr["counts"])
    np.testing.assert_array_equal(g2["rep"], gr["rep"])
    # order of group heads must be byte-lex ascending
    head_seqs = [seqs[i] for i in g2["rep"]]
    assert head_seqs == sorted(head_seqs)


def test_uniq_se_with_n_bases(tmp_path):
    """N-containing reads force the dna3 packing (words_encode_len) —
    parity must hold there too."""
    data = random_fastq(600, read_len=80, var_len=True, seed=61,
                        dup_frac=0.4, with_n=True)
    p = tmp_path / "in.fq"
    p.write_bytes(data)
    ref = run_oracle("gzfastq_uniq", ["-1", str(p), "-o", str(tmp_path / "ref")],
                     cwd=str(tmp_path))
    if ref is None:
        pytest.skip("no C toolchain")
    rc = cli_main(["gzfastq_uniq", "-1", str(p), "-o", str(tmp_path / "ours")])
    assert rc == 0
    ours = (tmp_path / "ours_sortKeyUniq.fq").read_bytes()
    refd = (tmp_path / "ref_sortKeyUniq.fq").read_bytes()
    assert ours == refd
    assert _records((tmp_path / "ours_uniq.fq").read_bytes()) == \
        _records((tmp_path / "ref_uniq.fq").read_bytes())


@pytest.mark.parametrize("flag,suffix", [("-s", "_sort_by_seq.fq"),
                                         ("-n", "_sort_by_name.fq")])
def test_sort_host_placement_parity(tmp_path, monkeypatch, flag, suffix):
    """NGSTPU_LINK=host routes the whole-file sort through the native
    256-way-bucket permutation (ngs_sort_perm_host) instead of the device
    lex_argsort — byte parity with the C comparator (length-first, then
    byte compare, stable ties; gzfastq_sort.c:85-103) must hold, N bases
    and variable lengths included."""
    from ngstpu.io.native import get_lib

    if get_lib() is None:
        pytest.skip("native library unavailable")
    monkeypatch.setenv("NGSTPU_LINK", "host")
    data = random_fastq(900, read_len=80, var_len=True, seed=52,
                        with_comment=True, dup_frac=0.4, with_n=True)
    p = tmp_path / "in.fq"
    p.write_bytes(data)
    ref = run_oracle("gzfastq_sort", ["-i", str(p), flag, "-o",
                                      str(tmp_path / "ref")],
                     cwd=str(tmp_path))
    if ref is None:
        pytest.skip("no C toolchain")
    rc = cli_main(["gzfastq_sort", "-i", str(p), flag, "-o",
                   str(tmp_path / "ours")])
    assert rc == 0
    assert (tmp_path / ("ours" + suffix)).read_bytes() == \
        (tmp_path / ("ref" + suffix)).read_bytes()


def test_sort_perm_host_matches_device_order():
    """The native host permutation must equal lex_argsort on random
    words/lens (length-first and lex-first), including tie stability."""
    import jax.numpy as jnp

    from ngstpu.io.native import get_lib
    from ngstpu.ops.sortengine import lex_argsort, sort_perm_host

    if get_lib() is None:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(5)
    for trial in range(6):
        B = int(rng.integers(1, 3000))
        W = int(rng.integers(1, 5))
        words = rng.integers(0, 4, (B, W)).astype(np.uint32)  # heavy ties
        lens = rng.integers(0, 7, B).astype(np.int32)
        for lf in (True, False):
            dev = np.asarray(lex_argsort(jnp.asarray(words),
                                         jnp.asarray(lens),
                                         length_first=lf))
            host = sort_perm_host(words, lens, lf)
            assert np.array_equal(dev, host), (trial, lf)


@pytest.mark.parametrize("flag,suffix", [("-s", "_sort_by_seq.fq"),
                                         ("-n", "_sort_by_name.fq")])
def test_sort_generic_path_still_covered(tmp_path, monkeypatch, flag,
                                         suffix):
    """NGSTPU_NO_FASTPATH=1 keeps the padded-batch generic path exercised
    now that the offset fast path handles file outputs by default; both
    must produce the same bytes."""
    monkeypatch.setenv("NGSTPU_NO_FASTPATH", "1")
    data = random_fastq(400, read_len=70, var_len=True, seed=53,
                        with_comment=True, dup_frac=0.3)
    p = tmp_path / "in.fq"
    p.write_bytes(data)
    cli_main(["gzfastq_sort", "-i", str(p), flag, "-o",
              str(tmp_path / "gen")])
    monkeypatch.delenv("NGSTPU_NO_FASTPATH")
    cli_main(["gzfastq_sort", "-i", str(p), flag, "-o",
              str(tmp_path / "fast")])
    assert (tmp_path / ("gen" + suffix)).read_bytes() == \
        (tmp_path / ("fast" + suffix)).read_bytes()


@pytest.mark.parametrize("flag,suffix", [("-s", "_sort_by_seq.fq"),
                                         ("-n", "_sort_by_name.fq")])
def test_sort_host_streamed_const_len_parity(tmp_path, monkeypatch, flag,
                                             suffix):
    """Round-5 streamed sort->emit (constant-length inputs route through
    _stream_sorted_emit: bucket radix on a sorter thread, emit of bucket
    k under the radix of k+1) must stay byte-identical to the C oracle.
    Fixed-length reads with heavy duplicates exercise deep radix ties."""
    from ngstpu.io.native import get_lib

    if get_lib() is None:
        pytest.skip("native library unavailable")
    monkeypatch.setenv("NGSTPU_LINK", "host")
    data = random_fastq(3000, read_len=80, var_len=False, seed=77,
                        dup_frac=0.5)
    p = tmp_path / "in.fq"
    p.write_bytes(data)
    ref = run_oracle("gzfastq_sort", ["-i", str(p), flag, "-o",
                                      str(tmp_path / "ref")],
                     cwd=str(tmp_path))
    if ref is None:
        pytest.skip("no C toolchain")
    rc = cli_main(["gzfastq_sort", "-i", str(p), flag, "-o",
                   str(tmp_path / "ours")])
    assert rc == 0
    assert (tmp_path / ("ours" + suffix)).read_bytes() == \
        (tmp_path / ("ref" + suffix)).read_bytes()
