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


def index_bam(path: str) -> bool:
    from .oracles import samtools_exe

    st = samtools_exe()
    if st is None:
        return False
    r = subprocess.run([st, "index", path], capture_output=True, timeout=120)
    return r.returncode == 0
