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


# ---------------------------------------------------------------------------
# BAM record mutation fuzz + adversarial BAI (SURVEY.md §4: robustness the
# reference never had — its scanners trust every length field)
# ---------------------------------------------------------------------------

def _fresh_body(tmp_path, n_reads=120, seed=7):
    from ngstpu.io.bam import parse_header
    from ngstpu.io.bgzf import read_bgzf
    from ngstpu.testing.bamfixtures import random_bam

    bam = tmp_path / "fuzz.bam"
    random_bam(str(bam), [("c1", 60000), ("c2", 40000)], n_reads, seed=seed)
    data = read_bgzf(str(bam))
    _, body_off = parse_header(data)
    return bytearray(data[body_off:])


def test_fuzz_bam_record_mutations(tmp_path):
    """Random byte mutations of the alignment section either raise
    ValueError or scan to internally-consistent columns — never crash,
    never read past validated bounds."""
    import numpy as np

    from ngstpu.io.bam import scan_records

    base = _fresh_body(tmp_path)
    rng = np.random.default_rng(11)
    for trial in range(80):
        body = bytearray(base)
        for _ in range(int(rng.integers(1, 5))):
            op = int(rng.integers(0, 3))
            pos = int(rng.integers(0, len(body)))
            if op == 0:
                body[pos] = int(rng.integers(0, 256))
            elif op == 1:
                del body[pos]
            else:
                body.insert(pos, int(rng.integers(0, 256)))
        arr = np.frombuffer(bytes(body), np.uint8)
        try:
            cols = scan_records(arr, strict=True)
        except ValueError:
            continue
        # survived: every record's claimed sizes must fit its block
        n = len(arr)
        for i in range(cols.n):
            o, ln = int(cols.rec_offset[i]), int(cols.rec_len[i])
            assert 0 <= o and o + ln <= n and ln >= 36
            assert cols.l_qseq[i] >= 0
        assert int(cols.n_cigar.sum()) == len(cols.cigar_op)


def test_bam_scan_malformed_fields(tmp_path):
    """Targeted corruptions: absurd n_cigar / l_seq / block_size raise
    cleanly in both scanners."""
    import struct

    import numpy as np
    import pytest

    from ngstpu.io.bam import _scan_python, scan_records

    base = _fresh_body(tmp_path, n_reads=10, seed=8)

    def corrupt(off_in_rec, fmt, value):
        body = bytearray(base)
        struct.pack_into(fmt, body, 4 + off_in_rec, value)
        return np.frombuffer(bytes(body), np.uint8)

    cases = [
        corrupt(12, "<H", 0xFFFF),             # n_cigar way past block
        corrupt(16, "<i", 1 << 30),             # l_seq way past block
        corrupt(16, "<i", -5),                  # negative l_seq
        corrupt(8, "<B", 0xFF),                 # l_read_name past block
    ]
    body = bytearray(base)
    struct.pack_into("<I", body, 0, 8)          # block_size < 32
    cases.append(np.frombuffer(bytes(body), np.uint8))
    for arr in cases:
        with pytest.raises(ValueError):
            scan_records(arr, strict=True)
        with pytest.raises(ValueError):
            _scan_python(arr, strict=True)


def test_bam_scan_trailing_partial(tmp_path):
    """strict=True raises on a cut final record; strict=False (the
    BAI-bounded region decode) stops cleanly before it."""
    import numpy as np
    import pytest

    from ngstpu.io.bam import _scan_python, scan_records

    base = _fresh_body(tmp_path, n_reads=20, seed=9)
    cut = np.frombuffer(bytes(base[: len(base) - 25]), np.uint8)
    with pytest.raises(ValueError):
        scan_records(cut, strict=True)
    with pytest.raises(ValueError):
        _scan_python(cut, strict=True)
    full = scan_records(np.frombuffer(bytes(base), np.uint8))
    cols = scan_records(cut, strict=False)
    assert cols.n == full.n - 1
    assert (np.asarray(cols.pos) == np.asarray(full.pos[:-1])).all()


def test_bai_adversarial_indexes(tmp_path):
    """Mutated .bai files: region decode raises ValueError or returns a
    clean column set — never crashes, never reads out of bounds."""
    import numpy as np
    import pytest

    from ngstpu.io.bai import read_bai, write_bai
    from ngstpu.io.bam import read_bam_region
    from ngstpu.testing.bamfixtures import random_bam

    bam = tmp_path / "adv.bam"
    random_bam(str(bam), [("c1", 60000)], 300, seed=10)
    bai = write_bai(str(bam))
    good = open(bai, "rb").read()

    rng = np.random.default_rng(12)
    outcomes = {"ok": 0, "valueerror": 0}
    for trial in range(60):
        data = bytearray(good)
        for _ in range(int(rng.integers(1, 6))):
            pos = int(rng.integers(0, len(data)))
            data[pos] = int(rng.integers(0, 256))
        with open(bai, "wb") as f:
            f.write(bytes(data))
        try:
            got = read_bam_region(str(bam), "c1", 1000, 30000)
        except ValueError:
            outcomes["valueerror"] += 1
            continue
        assert got is not None
        _, cols = got
        assert cols.n >= 0
        outcomes["ok"] += 1
    assert sum(outcomes.values()) == 60

    # targeted: voffsets far past EOF must not crash
    with open(bai, "wb") as f:
        f.write(good)
    idx = read_bai(bai)
    bins, lin = idx[0]
    for b in bins:
        bins[b] = [(1 << 60, (1 << 60) + (1 << 40))]
    # rebuild a minimal BAI with the poisoned chunks
    import struct as _s
    out = bytearray(b"BAI\x01" + _s.pack("<i", 1) + _s.pack("<i", len(bins)))
    for b, chunks in bins.items():
        out += _s.pack("<Ii", b, len(chunks))
        for vs, ve in chunks:
            out += _s.pack("<QQ", vs, ve)
    out += _s.pack("<i", len(lin)) + np.asarray(lin, "<u8").tobytes()
    with open(bai, "wb") as f:
        f.write(bytes(out))
    try:
        got = read_bam_region(str(bam), "c1", 1000, 30000)
        if got is not None:
            assert got[1].n >= 0
    except ValueError:
        pass


def test_bai_adversarial_fuzz(tmp_path):
    """VERDICT r1 item 10: adversarial .bai inputs — overlapping/reversed
    chunks, absurd n_intv/n_bin, random byte mutations and truncations.
    The reader and the region decode must either produce a result or
    raise ValueError; never crash with anything else."""
    import struct

    import numpy as np

    from ngstpu.io.bai import read_bai, region_voffsets, write_bai
    from ngstpu.io.bam import read_bam_region
    from ngstpu.testing.bamfixtures import random_bam

    bam = tmp_path / "f.bam"
    random_bam(str(bam), [("chr1", 60000), ("chr2", 30000)], 4000, seed=3)
    bai = tmp_path / "f.bam.bai"
    write_bai(str(bam), str(bai))
    good = bai.read_bytes()

    def attempt(blob: bytes):
        p = tmp_path / "mut.bam.bai"
        p.write_bytes(blob)
        try:
            refs = read_bai(str(p))
            region_voffsets(refs, 0, 100, 50000)
            region_voffsets(refs, 1, 0, 1 << 29)
        except ValueError:
            return
        # also drive the full region decode against the original BAM
        mb = tmp_path / "mut.bam"
        if not mb.exists():
            mb.write_bytes(bam.read_bytes())
        try:
            read_bam_region(str(mb) if blob is not good else str(bam),
                            "chr1", 100, 50000)
        except ValueError:
            pass

    # hand-crafted adversarial cases
    hdr = good[:8]
    # reversed + overlapping chunks in one bin, absurd linear index count
    evil = hdr
    evil += struct.pack("<i", 1)                      # n_bin for ref0
    evil += struct.pack("<Ii", 4681, 3)               # bin, n_chunk
    evil += struct.pack("<QQ", 900 << 16, 100 << 16)  # reversed
    evil += struct.pack("<QQ", 100 << 16, 500 << 16)
    evil += struct.pack("<QQ", 200 << 16, 400 << 16)  # overlapping
    evil += struct.pack("<i", 3)                      # n_intv
    evil += struct.pack("<QQQ", 0, 1 << 40, (1 << 63) | 7)
    evil += struct.pack("<i", 0) + struct.pack("<i", 0)  # ref1 empty
    attempt(evil)
    attempt(hdr + struct.pack("<i", -5))              # negative n_bin
    attempt(hdr + struct.pack("<i", 1 << 30))         # absurd n_bin
    attempt(good[:8] + struct.pack("<i", 2) + struct.pack("<i", -9))
    attempt(b"BAI\x01")                               # bare magic
    attempt(b"JUNKJUNKJUNK")

    rng = np.random.default_rng(0)
    g = np.frombuffer(good, np.uint8).copy()
    for _ in range(60):  # random mutations
        m = g.copy()
        for _ in range(int(rng.integers(1, 6))):
            m[rng.integers(0, len(m))] = rng.integers(0, 256)
        attempt(m.tobytes())
    for cut in rng.integers(0, len(good), 12):        # truncations
        attempt(good[:int(cut)])


def test_fuzz_bam_mutations_event_mode(tmp_path):
    """The event-mode pileup stream applies the SAME validation as the
    columnar scanner: on random mutations of a whole BGZF BAM, both either
    raise ValueError or produce identical per-chromosome event multisets
    (never crash, never diverge)."""
    import numpy as np

    from ngstpu.io.bam import stream_pileup_events
    from ngstpu.io.bgzf import compress_bgzf, read_bgzf
    from ngstpu.ops.bamops import stream_chrom_events
    from ngstpu.testing.bamfixtures import random_bam

    bam = tmp_path / "evfuzz.bam"
    random_bam(str(bam), [("c1", 60000), ("c2", 40000)], 150, seed=13)
    raw = bytearray(read_bgzf(str(bam)))
    rng = np.random.default_rng(17)
    hdr_end = 200  # keep the header prefix intact: target record bytes
    for trial in range(40):
        body = bytearray(raw)
        for _ in range(int(rng.integers(1, 4))):
            op = int(rng.integers(0, 3))
            pos = int(rng.integers(hdr_end, len(body)))
            if op == 0:
                body[pos] = int(rng.integers(0, 256))
            elif op == 1:
                del body[pos]
            else:
                body.insert(pos, int(rng.integers(0, 256)))
        p = tmp_path / "mut.bam"
        p.write_bytes(compress_bgzf(bytes(body)))

        def run(fn):
            try:
                got = fn(str(p), 0)
                if got is None:
                    pytest.skip("native library unavailable")
                out = []
                for pos_a, d_a in got[1]:
                    out.append(np.sort(pos_a.astype(np.int64) * 4
                                       + (d_a + 1)))
                return ("ok", out)
            except ValueError:
                return ("raise", None)

        k1, ev1 = run(stream_pileup_events)
        k2, ev2 = run(lambda q, m: stream_chrom_events(q, m))
        assert k1 == k2, trial
        if k1 == "ok":
            assert len(ev1) == len(ev2), trial
            for a, b in zip(ev1, ev2):
                assert np.array_equal(a, b), trial


def test_truncated_gzip_garbage_isize_fast(tmp_path, capsys):
    """A truncated gzip whose trailing 4 bytes read as a huge ISIZE must
    fail fast, not size (and fault) a multi-GB pooled buffer from the
    untrusted trailer."""
    import gzip
    import struct
    import time

    from ngstpu.testing.fixtures import random_fastq

    full = gzip.compress(random_fastq(200, read_len=60, seed=1))
    p = tmp_path / "big_isize.fq.gz"
    p.write_bytes(full[: len(full) // 2] + struct.pack("<I", 0xFFFFFFF0))
    t0 = time.monotonic()
    rc = cli_main(["fastq_count", str(p)])
    dt = time.monotonic() - t0
    assert rc == 1
    assert "invalid input" in capsys.readouterr().err
    assert dt < 30, f"truncated-gz handling took {dt:.1f}s"


def test_gz_crc_corruption_detected(tmp_path):
    """A multi-member .gz whose payload still inflates to the right
    length but carries a corrupted CRC trailer must NOT pass silently
    through the member-parallel fast path (advisor r4 medium: CRC
    verification is ON by default for general .gz inputs; NGSTPU_GZ_CRC=0
    opts out)."""
    from ngstpu.io.fastindex import index_fastq
    from ngstpu.testing.fixtures import random_fastq

    import gzip as _gzip

    data = random_fastq(2000, read_len=80, seed=11)
    p = tmp_path / "m.fq.gz"
    # three explicit members (the pigz/BGZF/ParallelGzipWriter layout the
    # member-parallel fast path speculates on)
    recs = data.split(b"\n")
    cut1 = (len(recs) // 3) * 4 * 0 + 4 * 700
    cut2 = 4 * 1400
    parts = [b"\n".join(recs[:cut1]) + b"\n",
             b"\n".join(recs[cut1:cut2]) + b"\n",
             b"\n".join(recs[cut2:-1]) + b"\n"]
    raw = bytearray(b"".join(_gzip.compress(x, 6, mtime=0) for x in parts))
    # find the second member boundary; corrupt the CRC32 (trailer bytes
    # [-8,-4) of the first member, i.e. right before the boundary)
    idx = raw.find(b"\x1f\x8b\x08", 1)
    assert idx > 0
    raw[idx - 8] ^= 0xFF
    p.write_bytes(bytes(raw))
    # fast path must reject (None -> generic), never return wrong bytes
    ix = index_fastq(str(p), pool=None)
    assert ix is None
    # the opt-out skips verification and accepts the stream (documented
    # integrity trade for trusted pipelines) — only check it doesn't crash
    import os
    os.environ["NGSTPU_GZ_CRC"] = "0"
    try:
        ix2 = index_fastq(str(p), pool=None)
        assert ix2 is not None and ix2.n == 2000
    finally:
        del os.environ["NGSTPU_GZ_CRC"]
