"""BAM container decode into columnar arrays (+ BAM writing).

Replaces the reference's vendored samtools-0.1.19 record path
(samopen/samread, sam.h:59-81; bam_fetch iteration) with a two-stage
host decode: BGZF blocks inflate in parallel (io.bgzf), then the native
scanner (ngsio.cpp ngs_bam_scan) emits structure-of-arrays — tid, pos,
flag, l_qseq, GC counts, flattened cigar — which feed the device pileup
ops directly. Raw per-record byte spans are retained so tools like
bamSplitChr can re-emit records verbatim.
"""

from __future__ import annotations

import dataclasses
import struct

import numpy as np

from .bgzf import compress_bgzf, read_bgzf
from .native import get_lib

BAM_MAGIC = b"BAM\x01"

# flag bits (samtools bam.h)
FUNMAP = 0x4
FSECONDARY = 0x100
FQCFAIL = 0x200
FDUP = 0x400
DEF_MASK = FUNMAP | FSECONDARY | FQCFAIL | FDUP

CIGAR_OPS = "MIDNSHP=X"


@dataclasses.dataclass
class BamHeader:
    text: bytes
    ref_names: list[str]
    ref_lens: list[int]

    @property
    def n_refs(self) -> int:
        return len(self.ref_names)

    def encode(self) -> bytes:
        out = [BAM_MAGIC, struct.pack("<i", len(self.text)), self.text,
               struct.pack("<i", self.n_refs)]
        for name, ln in zip(self.ref_names, self.ref_lens):
            nb = name.encode() + b"\x00"
            out.append(struct.pack("<i", len(nb)) + nb + struct.pack("<i", ln))
        return b"".join(out)


@dataclasses.dataclass
class BamColumns:
    """Columnar alignment data. All arrays have length n_records."""

    rec_offset: np.ndarray   # int64, offset into `body`
    rec_len: np.ndarray      # int32
    tid: np.ndarray          # int32
    pos: np.ndarray          # int32 (0-based leftmost)
    flag: np.ndarray         # int32
    mapq: np.ndarray         # int32
    l_qseq: np.ndarray       # int32
    gc: np.ndarray           # int32 (count of C/G 4-bit codes)
    cigar_offset: np.ndarray  # int64 into flat cigar arrays
    n_cigar: np.ndarray      # int32
    cigar_op: np.ndarray     # uint8  [total_ops]
    cigar_len: np.ndarray    # uint32 [total_ops]
    body: np.ndarray         # uint8: decompressed alignment section

    @property
    def n(self) -> int:
        return len(self.tid)


def parse_header(data: bytes) -> tuple[BamHeader, int]:
    """Parse the BAM header from decompressed bytes; returns (header, body_offset)."""
    if data[:4] != BAM_MAGIC:
        raise ValueError("not a BAM file")
    l_text = struct.unpack_from("<i", data, 4)[0]
    text = data[8:8 + l_text]
    o = 8 + l_text
    n_ref = struct.unpack_from("<i", data, o)[0]
    o += 4
    names, lens = [], []
    for _ in range(n_ref):
        l_name = struct.unpack_from("<i", data, o)[0]
        names.append(data[o + 4:o + 4 + l_name - 1].decode())
        lens.append(struct.unpack_from("<i", data, o + 4 + l_name)[0])
        o += 8 + l_name
    return BamHeader(text=text, ref_names=names, ref_lens=lens), o


def _scan_python(body: np.ndarray, strict: bool = True) -> BamColumns:
    """Pure-python fallback scanner (validation mirrors ngs_bam_count)."""
    data = body.tobytes()
    n = len(data)
    offs, lens, tids, poss, flags, mapqs, lseqs, gcs = [], [], [], [], [], [], [], []
    cig_off, n_cig, ops_all, clens_all = [], [], [], []
    gc_nibble = np.zeros(16, dtype=np.int32)
    gc_nibble[2] = gc_nibble[4] = 1
    o = 0
    while o + 4 <= n:
        bs = struct.unpack_from("<I", data, o)[0]
        if o + 4 + bs > n:
            break
        if bs < 32:
            raise ValueError("malformed BAM record (block_size < 32)")
        r = o + 4
        tid, pos = struct.unpack_from("<ii", data, r)
        l_read_name = data[r + 8]
        mapq = data[r + 9]
        nc, flag = struct.unpack_from("<HH", data, r + 12)
        l_seq = struct.unpack_from("<i", data, r + 16)[0]
        if (l_read_name < 1 or l_seq < 0
                or 32 + l_read_name + 4 * nc + (l_seq + 1) // 2 + l_seq > bs):
            raise ValueError("malformed BAM record (field sizes exceed"
                             " block_size)")
        p = r + 32 + l_read_name
        cig_off.append(len(ops_all))
        n_cig.append(nc)
        for k in range(nc):
            cg = struct.unpack_from("<I", data, p + 4 * k)[0]
            ops_all.append(cg & 0xF)
            clens_all.append(cg >> 4)
        seq = np.frombuffer(data, np.uint8, (l_seq + 1) // 2, p + 4 * nc)
        g = int(gc_nibble[seq >> 4].sum() + gc_nibble[seq & 0xF].sum())
        if l_seq % 2:
            g -= int(gc_nibble[seq[-1] & 0xF]) if len(seq) else 0
        offs.append(o)
        lens.append(4 + bs)
        tids.append(tid)
        poss.append(pos)
        flags.append(flag)
        mapqs.append(mapq)
        lseqs.append(l_seq)
        gcs.append(g)
        o += 4 + bs
    if strict and o != n:
        raise ValueError("truncated BAM alignment section")
    return BamColumns(
        rec_offset=np.array(offs, np.int64), rec_len=np.array(lens, np.int32),
        tid=np.array(tids, np.int32), pos=np.array(poss, np.int32),
        flag=np.array(flags, np.int32), mapq=np.array(mapqs, np.int32),
        l_qseq=np.array(lseqs, np.int32), gc=np.array(gcs, np.int32),
        cigar_offset=np.array(cig_off, np.int64),
        n_cigar=np.array(n_cig, np.int32),
        cigar_op=np.array(ops_all, np.uint8),
        cigar_len=np.array(clens_all, np.uint32), body=body)


def scan_records(body: np.ndarray, strict: bool = True) -> BamColumns:
    """Columnar record scan of a decompressed alignment section.

    strict=True (whole-file reads) raises ValueError on a trailing partial
    record; strict=False (BAI-bounded block-range decodes, where the last
    block legitimately cuts a record) stops cleanly at it. A record whose
    claimed name/cigar/seq sizes exceed its block_size is malformed and
    raises in both modes — the scanners never read past validated bounds.
    """
    lib = get_lib()
    if lib is None:
        return _scan_python(body, strict=strict)
    import ctypes

    n_rec = ctypes.c_int64()
    n_cig = ctypes.c_int64()
    rc = lib.ngs_bam_count(body, len(body), ctypes.byref(n_rec),
                           ctypes.byref(n_cig))
    if rc == 2:
        raise ValueError("malformed BAM record (field sizes exceed"
                         " block_size)")
    if rc == 1 and strict:
        raise ValueError("truncated BAM alignment section")
    R, C = n_rec.value, n_cig.value
    cols = BamColumns(
        rec_offset=np.empty(R, np.int64), rec_len=np.empty(R, np.int32),
        tid=np.empty(R, np.int32), pos=np.empty(R, np.int32),
        flag=np.empty(R, np.int32), mapq=np.empty(R, np.int32),
        l_qseq=np.empty(R, np.int32), gc=np.empty(R, np.int32),
        cigar_offset=np.empty(R, np.int64), n_cigar=np.empty(R, np.int32),
        cigar_op=np.empty(C, np.uint8), cigar_len=np.empty(C, np.uint32),
        body=body)
    if R:
        lib.ngs_bam_scan(body, len(body), cols.rec_offset, cols.rec_len,
                         cols.tid, cols.pos, cols.flag, cols.mapq,
                         cols.l_qseq, cols.gc, cols.cigar_offset,
                         cols.n_cigar, cols.cigar_op, cols.cigar_len, 0)
    return cols


def read_bam(path: str) -> tuple[BamHeader, BamColumns]:
    data = read_bgzf(path)
    header, body_off = parse_header(data)
    body = np.frombuffer(data, dtype=np.uint8, offset=body_off)
    return header, scan_records(body)


class BamStream:
    """Chunked BAM decode with bounded RSS: BGZF batches inflate in
    parallel (io.bgzf.iter_inflated) and each batch scans to columnar
    arrays; a record cut by a batch edge carries into the next batch.
    Replaces the whole-file inflate for the streaming tools so a BAM
    larger than free RAM processes in O(chunk) memory — the role of
    samtools' samread loop (reference sam.h:59-81).

    Usage: s = BamStream(path); s.header; for cols in s: ...
    Each yielded BamColumns is self-contained (rec_offset indexes its own
    `body` slice).
    """

    def __init__(self, path: str, chunk_bytes: int = 32 << 20):
        from .bgzf import iter_inflated

        self._gen = iter_inflated(path, chunk_bytes)
        buf = b""
        while True:
            if len(buf) >= 4 and buf[:4] != BAM_MAGIC:
                raise ValueError("not a BAM file")
            try:
                self.header, body_off = parse_header(buf)
                break
            except (ValueError, IndexError, struct.error):
                nxt = next(self._gen, None)
                if nxt is None:
                    raise ValueError("truncated BAM header")
                buf += nxt
        self._carry = buf[body_off:]

    def __iter__(self):
        carry = self._carry
        self._carry = b""
        for data in self._gen:
            body_bytes = carry + data if carry else data
            body = np.frombuffer(body_bytes, dtype=np.uint8)
            cols = scan_records(body, strict=False)
            if cols.n:
                consumed = int(cols.rec_offset[-1] + cols.rec_len[-1])
                carry = body_bytes[consumed:]
                yield cols
            else:
                carry = body_bytes
        if carry:
            body = np.frombuffer(carry, dtype=np.uint8)
            yield scan_records(body, strict=True)


def read_bam_region(path: str, ref_name_or_tid, beg: int, end: int
                    ) -> tuple[BamHeader, BamColumns] | None:
    """BAI-driven region decode: inflate ONLY the BGZF blocks whose virtual
    offsets can hold records overlapping [beg, end) on the given reference
    (samtools' bam_fetch block-skip, reference bam2depth.c:121-130, done
    block-parallel). Requires `path`.bai (ours or samtools'); returns None
    when no index is available (caller falls back to the full scan), and
    an empty column set when the index proves the region empty.

    Returned records are the superset held by the overlapping chunks —
    callers apply the precise region/flag mask exactly as with a full scan.
    """
    import os

    from .bai import read_bai, region_voffsets
    from .bgzf import _scan_blocks, decompress_block_range

    bai_path = path + ".bai"
    if not os.path.exists(bai_path):
        return None
    with open(path, "rb") as f:
        raw = f.read()
    starts, lens, isizes = _scan_blocks(raw)

    # decode the header prefix (usually one block) incrementally
    n_hdr_blocks = 1
    while True:
        prefix = decompress_block_range(raw, starts, lens, isizes, 0,
                                        n_hdr_blocks)
        try:
            header, body_off = parse_header(prefix)
            break
        except (struct.error, IndexError, ValueError):
            if n_hdr_blocks >= len(starts):
                raise
            n_hdr_blocks += 1

    tid = (header.ref_names.index(ref_name_or_tid)
           if isinstance(ref_name_or_tid, str) else int(ref_name_or_tid))
    window = region_voffsets(read_bai(bai_path), tid, beg, end)
    empty = BamColumns(
        rec_offset=np.zeros(0, np.int64), rec_len=np.zeros(0, np.int32),
        tid=np.zeros(0, np.int32), pos=np.zeros(0, np.int32),
        flag=np.zeros(0, np.int32), mapq=np.zeros(0, np.int32),
        l_qseq=np.zeros(0, np.int32), gc=np.zeros(0, np.int32),
        cigar_offset=np.zeros(0, np.int64), n_cigar=np.zeros(0, np.int32),
        cigar_op=np.zeros(0, np.uint8), cigar_len=np.zeros(0, np.uint32),
        body=np.zeros(0, np.uint8))
    if window is None:
        return header, empty
    v_lo, v_hi = window
    blk_lo = max(int(np.searchsorted(starts, v_lo >> 16, side="right")) - 1, 0)
    blk_hi = int(np.searchsorted(starts, v_hi >> 16, side="right"))
    if (v_hi & 0xFFFF) == 0:
        blk_hi -= 1  # chunk ends exactly at a block boundary
    blk_hi = min(max(blk_hi, blk_lo + 1), len(starts))
    data = decompress_block_range(raw, starts, lens, isizes, blk_lo, blk_hi)
    intra = v_lo & 0xFFFF
    if intra > len(data):
        raise ValueError("corrupt BAI: virtual offset beyond block payload")
    body = np.frombuffer(data, dtype=np.uint8, offset=intra)
    # tolerate a record cut by the final block's edge (past the BAI chunk
    # end, so never one the caller's region mask would keep)
    return header, scan_records(body, strict=False)


def write_bam(path: str, header: BamHeader, record_bytes: bytes,
              level: int = 6) -> None:
    """Write header + raw record bytes as a BGZF BAM file."""
    with open(path, "wb") as f:
        f.write(compress_bgzf(header.encode() + record_bytes, level=level))
