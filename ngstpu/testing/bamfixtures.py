"""Synthetic BAM fixture writer for differential tests.

Builds coordinate-sorted BAM files from scratch (header + records + BGZF)
so the compiled reference tools (which need a .bai from the vendored
samtools) and ngstpu read identical inputs.
"""

from __future__ import annotations

import struct
import subprocess

import numpy as np

from ..io.bam import BamHeader, write_bam

SEQ_CODE = {c: i for i, c in enumerate("=ACMGRSVTWYHKDBN")}
CIGAR_OP_CODE = {c: i for i, c in enumerate("MIDNSHP=X")}


def reg2bin(beg: int, end: int) -> int:
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


def parse_cigar(cigar: str) -> list[tuple[int, int]]:
    ops = []
    num = ""
    for ch in cigar:
        if ch.isdigit():
            num += ch
        else:
            ops.append((int(num), CIGAR_OP_CODE[ch]))
            num = ""
    return ops


def ref_span(cigar_ops: list[tuple[int, int]]) -> int:
    # ops that consume reference: M, D, N, =, X
    return sum(l for l, op in cigar_ops if op in (0, 2, 3, 7, 8))


def encode_record(name: str, tid: int, pos: int, mapq: int, cigar: str,
                  seq: str, qual: bytes | None = None, flag: int = 0) -> bytes:
    ops = parse_cigar(cigar) if cigar else []
    l_seq = len(seq)
    if qual is None:
        qual = bytes([30] * l_seq)
    nb = name.encode() + b"\x00"
    end = pos + max(ref_span(ops), 1)
    rec = struct.pack("<iiBBHHHiiii", tid, pos, len(nb), mapq,
                      reg2bin(pos, end), len(ops), flag, l_seq, -1, -1, 0)
    rec += nb
    for l, op in ops:
        rec += struct.pack("<I", (l << 4) | op)
    packed = bytearray()
    for i in range(0, l_seq, 2):
        hi = SEQ_CODE.get(seq[i], 15) << 4
        lo = SEQ_CODE.get(seq[i + 1], 15) if i + 1 < l_seq else 0
        packed.append(hi | lo)
    rec += bytes(packed) + qual
    return struct.pack("<I", len(rec)) + rec


def make_bam(path: str, refs: list[tuple[str, int]], records: list[bytes],
             sam_text: str | None = None) -> None:
    if sam_text is None:
        sam_text = "@HD\tVN:1.0\tSO:coordinate\n" + "".join(
            f"@SQ\tSN:{n}\tLN:{l}\n" for n, l in refs)
    header = BamHeader(text=sam_text.encode(),
                       ref_names=[n for n, _ in refs],
                       ref_lens=[l for _, l in refs])
    write_bam(path, header, b"".join(records))


def random_bam(path: str, refs: list[tuple[str, int]], n_reads: int,
               seed: int = 0, read_len: int = 100, with_cigar_mix: bool = True,
               flag_frac: float = 0.1) -> None:
    """Coordinate-sorted random BAM touching all chromosomes."""
    rng = np.random.default_rng(seed)
    recs = []
    per_ref: list[list[bytes]] = [[] for _ in refs]
    for i in range(n_reads):
        tid = int(rng.integers(0, len(refs)))
        tlen = refs[tid][1]
        pos = int(rng.integers(0, max(tlen - read_len - 60, 1)))
        if with_cigar_mix and rng.random() < 0.4:
            a = int(rng.integers(10, read_len - 20))
            kind = rng.random()
            if kind < 0.4:
                cigar = f"{a}M{int(rng.integers(1, 30))}D{read_len - a}M"
            elif kind < 0.7:
                cigar = f"{a}M{int(rng.integers(1, 10))}I{read_len - a - int(rng.integers(1, 10))}M"
                # keep it simple: recompute below
                ins = int(rng.integers(1, 10))
                cigar = f"{a}M{ins}I{read_len - a - ins}M"
            else:
                cigar = f"{a}M{int(rng.integers(20, 60))}N{read_len - a}M"
        else:
            cigar = f"{read_len}M"
        flag = 0
        r = rng.random()
        if r < flag_frac:
            flag = int(rng.choice([0x4, 0x100, 0x200, 0x400, 0x10]))
        seq = "".join(rng.choice(list("ACGT"), read_len))
        per_ref[tid].append((pos, encode_record(
            f"r{i:06d}", tid, pos, 60, cigar, seq, flag=flag)))
    for tid in range(len(refs)):
        for pos, rec in sorted(per_ref[tid], key=lambda t: t[0]):
            recs.append(rec)
    make_bam(path, refs, recs)


def _reg2bin_vec(beg: np.ndarray, end: np.ndarray) -> np.ndarray:
    """Vectorized reg2bin (same magic-number ladder as reg2bin above)."""
    e = end - 1
    out = np.zeros(len(beg), np.int64)
    done = np.zeros(len(beg), bool)
    for shift, base in ((14, ((1 << 15) - 1) // 7), (17, ((1 << 12) - 1) // 7),
                        (20, ((1 << 9) - 1) // 7), (23, ((1 << 6) - 1) // 7),
                        (26, ((1 << 3) - 1) // 7)):
        hit = ~done & ((beg >> shift) == (e >> shift))
        out[hit] = base + (beg[hit] >> shift)
        done |= hit
    return out


def random_bam_fast(path: str, refs: list[tuple[str, int]], n_reads: int,
                    seed: int = 0, read_len: int = 100,
                    mix_frac: float = 0.3, flag_frac: float = 0.1) -> None:
    """Vectorized coordinate-sorted random BAM for WGS-scale fixtures.

    Same record shapes as random_bam (flag mix, M-only and M/D/M cigars)
    but assembled with numpy column writes — ~1000x faster than the
    per-read encode_record loop, practical at 10M+ reads x Gbp genomes.
    """
    rng = np.random.default_rng(seed)
    L = int(read_len)
    n_refs = len(refs)
    ref_lens = np.array([l for _, l in refs], np.int64)

    tid = rng.integers(0, n_refs, n_reads).astype(np.int64)
    span = np.maximum(ref_lens[tid] - L - 64, 1)
    pos = (rng.random(n_reads) * span).astype(np.int64)
    order = np.lexsort((pos, tid))
    tid, pos = tid[order], pos[order]

    is_mix = rng.random(n_reads) < mix_frac
    a_op = rng.integers(10, max(L - 20, 11), n_reads)
    d_op = rng.integers(1, 31, n_reads)
    flag = np.zeros(n_reads, np.int64)
    f_hit = rng.random(n_reads) < flag_frac
    flag[f_hit] = rng.choice([0x4, 0x100, 0x200, 0x400, 0x10],
                             int(f_hit.sum()))

    ref_end = pos + np.where(is_mix, L + d_op, L)
    bins = _reg2bin_vec(pos, ref_end)
    name_len = 10  # "r" + 8 digits + NUL
    seq_b = (L + 1) // 2
    fixed = 32 + name_len + seq_b + L  # sans cigar, sans block_size field
    n_ops = np.where(is_mix, 3, 1)
    rec_size = 4 + fixed + 4 * n_ops
    starts = np.zeros(n_reads, np.int64)
    np.cumsum(rec_size[:-1], out=starts[1:])
    total = int(starts[-1] + rec_size[-1])
    out = np.zeros(total, np.uint8)

    def put_i32(col_off: np.ndarray, vals: np.ndarray) -> None:
        v = vals.astype("<i4").view(np.uint8).reshape(-1, 4)
        for b in range(4):
            out[col_off + b] = v[:, b]

    def put_u16(col_off: np.ndarray, vals: np.ndarray) -> None:
        v = vals.astype("<u2").view(np.uint8).reshape(-1, 2)
        for b in range(2):
            out[col_off + b] = v[:, b]

    put_i32(starts, rec_size - 4)          # block_size
    put_i32(starts + 4, tid)
    put_i32(starts + 8, pos)
    out[starts + 12] = name_len
    out[starts + 13] = 60                  # mapq
    put_u16(starts + 14, bins)
    put_u16(starts + 16, n_ops)
    put_u16(starts + 18, flag)
    put_i32(starts + 20, np.full(n_reads, L))
    put_i32(starts + 24, np.full(n_reads, -1))   # next_refID
    put_i32(starts + 28, np.full(n_reads, -1))   # next_pos
    put_i32(starts + 32, np.zeros(n_reads))      # tlen
    # name "r%08d" by sorted ordinal
    idx = np.arange(n_reads, dtype=np.int64)
    out[starts + 36] = ord("r")
    for k in range(8):
        out[starts + 37 + k] = (idx // 10 ** (7 - k)) % 10 + 48
    # cigar
    c0 = starts + 36 + name_len
    m1 = ~is_mix
    put_i32_at = put_i32  # alias for clarity
    if m1.any():
        put_i32_at(c0[m1], np.full(int(m1.sum()), (L << 4) | 0))
    if is_mix.any():
        am, dm = a_op[is_mix], d_op[is_mix]
        cm = c0[is_mix]
        put_i32_at(cm, (am << 4) | 0)
        put_i32_at(cm + 4, (dm << 4) | 2)
        put_i32_at(cm + 8, ((L - am) << 4) | 0)
    # seq (4-bit codes) + qual, random
    s0 = c0 + 4 * n_ops
    lut = np.array([1, 2, 4, 8], np.uint8)  # A C G T
    codes = lut[rng.integers(0, 4, (n_reads, L)).astype(np.int8)]
    packed = (codes[:, 0::2] << 4)
    packed[:, : L // 2] |= codes[:, 1::2]
    for b in range(seq_b):
        out[s0 + b] = packed[:, b]
    qual = rng.integers(20, 41, (n_reads, L)).astype(np.uint8)
    q0 = s0 + seq_b
    for b in range(L):
        out[q0 + b] = qual[:, b]

    sam_text = "@HD\tVN:1.0\tSO:coordinate\n" + "".join(
        f"@SQ\tSN:{n}\tLN:{l}\n" for n, l in refs)
    header = BamHeader(text=sam_text.encode(),
                       ref_names=[n for n, _ in refs],
                       ref_lens=[int(l) for _, l in refs])
    write_bam(path, header, out.tobytes())


def index_bam(path: str) -> bool:
    from .oracles import samtools_exe

    st = samtools_exe()
    if st is None:
        return False
    r = subprocess.run([st, "index", path], capture_output=True, timeout=120)
    return r.returncode == 0
