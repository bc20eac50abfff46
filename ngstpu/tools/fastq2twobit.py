"""fastq2twobit: pack FASTQ sequences into the reference 2-bit container.

Parity target: reference fastq2twobit.c. Container = 2-byte header
{uint8 readLen, uint8 packedLen} taken from the FIRST emitted record
(:150-156), then per-record ceil(len/4) packed bytes (each record packs its
OWN length, :150). Records are emitted in REVERSE input order — the
reference loads into a prepend list and dumps head-first without the
(commented-out) sort (:101-113 dump_array with arrays[i++]).
Output file gets the reference's accidental "_sort_by_seq.fq"
("_sort_by_name.fq" with -n) suffix (:128); default "-" -> stdout.
Packing is the device 2-bit kernel (T/U->0, C->1, A->2, G->3, N->T,
reference twoBit.h:54-71,167-181).
"""

from __future__ import annotations

import getopt
import sys

import numpy as np
import jax.numpy as jnp

from ..io.fastq import read_fastq_file
from ..io.stream import open_output, with_suffix
from ..ops.twobit import pack2bit
from ..utils.timing import StageTimer


def main(argv: list[str]) -> int:
    timer = StageTimer()
    infile, outfile = "-", "-"
    by_name = by_seq = 0
    if not argv:
        _usage()
        return 1
    opts, _ = getopt.gnu_getopt(argv, "i:o:nsh?")
    for flag, val in opts:
        if flag == "-i":
            infile = val
        elif flag == "-o":
            outfile = val
        elif flag == "-n":
            by_name, by_seq = 1, 0
        elif flag == "-s":
            by_name, by_seq = 0, 1
        elif flag in ("-h", "-?"):
            _usage()
            return 1
    sys.stderr.write(f"name: {by_name}\tseq: {by_seq}\n")

    batch = read_fastq_file(infile, need=("seq",))
    timer.log("done read file at %.3f s\n")
    packed = np.asarray(pack2bit(jnp.asarray(batch.seq)))  # [B, Lmax//4]
    suffix = "_sort_by_name.fq" if (by_name and not by_seq) else "_sort_by_seq.fq"
    out = open_output(with_suffix(outfile, suffix))

    order = np.arange(batch.n - 1, -1, -1)  # reverse input order
    lens = batch.lens
    if batch.n:
        first = int(order[0])
        read_len = int(lens[first]) & 0xFF
        packed_len = ((int(lens[first]) + 3) // 4) & 0xFF
        out.write(bytes([read_len, packed_len]))
        # each record contributes ceil(len/4) bytes of its own packed row
        plens = ((lens[order].astype(np.int64) + 3) // 4).astype(np.int32)
        rows = packed[order]
        # ragged flatten of leading plens[i] bytes per row
        col = np.arange(rows.shape[1])
        flat = rows[col[None, :] < plens[:, None]]
        out.write(flat.tobytes())
    if out is not sys.stdout.buffer:
        out.close()
    else:
        out.flush()
    timer.log("done write file at %.3f s\n")
    return 0


def _usage() -> None:
    sys.stderr.write(
        "Usage: ngstpu fastq2twobit [-i Infile] [-o OUTFILE] [-s|-n] [-h]\n")
