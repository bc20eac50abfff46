"""gzfastq_mrle: RLE-encode quality strings (experimental codec).

Parity target: reference gzfastq_mrle.c. Records are processed in INPUT
order (the prepend-list + reversing dump restores it, :171-183; the qsort
is commented out). Per record the encoder writes one length byte (int
truncated to unsigned char, :212) + payload to the output file (which gets
the accidental _sort_by_seq.fq / _sort_by_name.fq suffix, :197), and the
round-tripped decoded quality is printed to stdout as a self-check (:211).
"""

from __future__ import annotations

import getopt
import sys

from ..io.fastq import FastqChunkReader
from ..io.stream import open_output, with_suffix
from ..ops.rle import mrle_decode, mrle_encode
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

    suffix = "_sort_by_name.fq" if (by_name and not by_seq) else "_sort_by_seq.fq"
    out = open_output(with_suffix(outfile, suffix))
    n = 0
    for batch in FastqChunkReader(infile):
        for i in range(batch.n):
            q = batch.qual_bytes(i)
            enc = mrle_encode(q)
            dec = mrle_decode(enc, len(q))
            sys.stdout.buffer.write(dec + b"\n")
            out.write(bytes([len(enc) & 0xFF]) + enc)
            n += 1
    if out is not sys.stdout.buffer:
        out.close()
    else:
        out.flush()
    sys.stdout.buffer.flush()
    timer.log("done write file at %.3f s\n")
    return 0


def _usage() -> None:
    sys.stderr.write(
        "Usage: ngstpu gzfastq_mrle [-i Infile] [-o OUTFILE] [-s|-n] [-h]\n")
