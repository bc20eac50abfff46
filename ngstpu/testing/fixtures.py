"""Deterministic random FASTQ/BAM fixture generators for differential tests.

Modeled on the role of fastq-tools' tests/random_fastq.c in the reference
ecosystem (SURVEY.md §4): generate synthetic inputs, run both the compiled C
oracle and the ngstpu implementation, assert equivalence.
"""

from __future__ import annotations

import gzip
import io

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)
BASES_N = np.frombuffer(b"ACGTN", dtype=np.uint8)


def random_fastq(n_reads: int, read_len: int = 100, seed: int = 0,
                 var_len: bool = False, min_len: int = 30,
                 with_n: bool = False, name_prefix: str = "read",
                 with_comment: bool = False, dup_frac: float = 0.0,
                 qual_lo: int = 33, qual_hi: int = 74,
                 qual_alphabet: bytes | None = None) -> bytes:
    """Generate FASTQ text. dup_frac makes that fraction of reads copies of
    earlier reads (for dedup tests)."""
    rng = np.random.default_rng(seed)
    lens = (rng.integers(min_len, read_len + 1, n_reads) if var_len
            else np.full(n_reads, read_len, dtype=np.int64))
    alphabet = BASES_N if with_n else BASES
    out = io.BytesIO()
    seqs: list[bytes] = []
    for i in range(n_reads):
        li = int(lens[i])
        if dup_frac > 0 and i > 0 and rng.random() < dup_frac:
            j = int(rng.integers(0, len(seqs)))
            seq = seqs[j]
            li = len(seq)
        else:
            seq = alphabet[rng.integers(0, len(alphabet), li)].tobytes()
        seqs.append(seq)
        if qual_alphabet is not None:
            qa = np.frombuffer(qual_alphabet, dtype=np.uint8)
            qual = qa[rng.integers(0, len(qa), li)].tobytes()
        else:
            qual = rng.integers(qual_lo, qual_hi + 1, li, dtype=np.uint8).tobytes()
        name = f"@{name_prefix}_{i}"
        if with_comment:
            name += f" comment/{i % 2 + 1}"
        out.write(name.encode() + b"\n" + seq + b"\n+\n" + qual + b"\n")
    return out.getvalue()


def random_fastq_fast(n_reads: int, read_len: int = 100, seed: int = 0,
                      name_prefix: str = "read",
                      dup_frac: float = 0.0) -> bytes:
    """Fully vectorized fixed-length FASTQ generator (for benchmarks)."""
    rng = np.random.default_rng(seed)
    seqs = BASES[rng.integers(0, 4, (n_reads, read_len))]
    if dup_frac > 0:
        src = rng.integers(0, n_reads, n_reads)
        dup = rng.random(n_reads) < dup_frac
        seqs = seqs[np.where(dup, src, np.arange(n_reads))]
    quals = rng.integers(33, 75, (n_reads, read_len), dtype=np.uint8)
    names = np.array([f"@{name_prefix}_{i}".encode() for i in range(n_reads)],
                     dtype=object)
    name_lens = np.array([len(n) for n in names], dtype=np.int64)
    rec_lens = name_lens + 1 + read_len + 3 + read_len + 1
    rec_starts = np.zeros(n_reads, dtype=np.int64)
    np.cumsum(rec_lens[:-1], out=rec_starts[1:])
    total = int(rec_lens.sum())
    out = np.empty(total, dtype=np.uint8)
    from ..io.ragged import ragged_arange
    ndest = np.repeat(rec_starts, name_lens) + ragged_arange(name_lens)
    out[ndest] = np.frombuffer(b"".join(names), dtype=np.uint8)
    col = np.arange(read_len, dtype=np.int64)
    sstart = rec_starts + name_lens + 1
    out[(sstart[:, None] + col[None, :]).ravel()] = seqs.ravel()
    out[(sstart + read_len + 3)[:, None].repeat(read_len, 1).ravel()
        + np.tile(col, n_reads)] = quals.ravel()
    out[rec_starts + name_lens] = 0x0A
    out[sstart + read_len] = 0x0A
    out[sstart + read_len + 1] = ord("+")
    out[sstart + read_len + 2] = 0x0A
    out[rec_starts + rec_lens - 1] = 0x0A
    return out.tobytes()


def random_fastq_pair(n_reads: int, read_len: int = 100, seed: int = 0,
                      **kw) -> tuple[bytes, bytes]:
    r1 = random_fastq(n_reads, read_len, seed, name_prefix="pair", **kw)
    r2 = random_fastq(n_reads, read_len, seed + 1, name_prefix="pair", **kw)
    return r1, r2


def gz(data: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
        f.write(data)
    return buf.getvalue()


def write_fixture(tmp_path, name: str, data: bytes) -> str:
    p = tmp_path / name
    p.write_bytes(data)
    return str(p)


def random_fastq_pair_sorted(n_reads: int, read_len: int = 100,
                             seed: int = 0, drop_frac: float = 0.1
                             ) -> tuple[bytes, bytes]:
    """Name-sorted PE fixture for pick_pair-shaped workloads (BASELINE
    config 4): zero-padded ordinal names (lexicographic == numeric order),
    each mate file missing a disjoint random `drop_frac` subset so the
    merge-join produces both PE and SE outputs."""
    rng = np.random.default_rng(seed)
    u = rng.random(n_reads)
    drop1 = u < drop_frac
    drop2 = (u >= drop_frac) & (u < 2 * drop_frac)
    # shared undropped tail: the reference's merge loop (pick_pair.c:
    # 104-118) dereferences NULL if one file exhausts while the other
    # still holds records at the outer read; a common matched tail makes
    # both sides reach EOF in the same iteration (misalignments from
    # interior mismatched pairings are absorbed as SE records), keeping
    # the C oracle alive on this fixture.
    tail = max(64, n_reads // 1000)
    drop1[-tail:] = False
    drop2[-tail:] = False

    def one(keep: np.ndarray, s: int) -> bytes:
        idx = np.flatnonzero(keep)
        r = np.random.default_rng(s)
        seqs = BASES[r.integers(0, 4, (len(idx), read_len))]
        quals = r.integers(33, 74, (len(idx), read_len), dtype=np.uint8)
        parts = []
        for row, i in enumerate(idx):
            parts.append(b"@p%08d m%d\n" % (i, s))
            parts.append(seqs[row].tobytes())
            parts.append(b"\n+\n")
            parts.append(quals[row].tobytes())
            parts.append(b"\n")
        return b"".join(parts)

    return one(~drop1, seed + 10), one(~drop2, seed + 11)
