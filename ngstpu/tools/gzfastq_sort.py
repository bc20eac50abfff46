"""gzfastq_sort: whole-file FASTQ sort by sequence or name on the TPU.

Parity target: reference gzfastq_sort.c. Comparators are length-first, then
strcmp (comp_name :85-93, comp_seq :95-103); glibc qsort is stable
(mergesort), so ties keep input order — our stable device sort matches.
Output file = outfile + "_sort_by_name.fq" / "_sort_by_seq.fq"
(:122-128); default outfile "-" streams to stdout. -r (preallocation hint)
is accepted and ignored — we size from the data.
"""

from __future__ import annotations

import getopt
import sys

import numpy as np
import jax.numpy as jnp

from ..io.fastq import format_fastq, read_fastq_file
from ..io.native import fill_padded
from ..io.stream import open_output, with_suffix
from ..ops.sortengine import bytes_to_words, lex_argsort, seq_words
from ..utils.timing import StageTimer

OUT_CHUNK = 1 << 20


def emit_permuted(out, batch, perm: np.ndarray) -> None:
    """Write records of `batch` in `perm` order, chunked."""
    for lo in range(0, len(perm), OUT_CHUNK):
        sub = batch.take(perm[lo:lo + OUT_CHUNK])
        out.write(format_fastq(sub.names, sub.name_starts, sub.name_lens,
                               sub.seq, sub.qual, sub.lens))


def sort_perm_by_seq(batch) -> np.ndarray:
    words = seq_words(batch.seq)
    return np.asarray(lex_argsort(words, jnp.asarray(batch.lens),
                                  length_first=True))


def sort_perm_by_name(batch) -> np.ndarray:
    lmax = max(int(batch.name_lens.max(initial=0)), 4)
    lmax = (lmax + 3) // 4 * 4
    padded = fill_padded(batch.names, batch.name_starts, batch.name_lens, lmax)
    words = bytes_to_words(jnp.asarray(padded))
    return np.asarray(lex_argsort(words, jnp.asarray(batch.name_lens),
                                  length_first=True))


def main(argv: list[str]) -> int:
    timer = StageTimer()
    infile, outfile = "-", "-"
    by_name = by_seq = 0
    if not argv:
        _usage()
        return 1
    opts, _ = getopt.gnu_getopt(argv, "i:o:r:nsh?")
    for flag, val in opts:
        if flag == "-i":
            infile = val
        elif flag == "-o":
            outfile = val
        elif flag == "-r":
            pass  # preallocation hint: unnecessary here
        elif flag == "-n":
            by_name, by_seq = 1, 0
        elif flag == "-s":
            by_name, by_seq = 0, 1
        elif flag in ("-h", "-?"):
            _usage()
            return 1
    if not by_name and not by_seq:
        by_seq = 1
    sys.stderr.write(f"name: {by_name}\tseq: {by_seq}\n")

    batch = read_fastq_file(infile)
    timer.log("done read file at %.3f s\n")
    if by_name:
        perm = sort_perm_by_name(batch)
        out = open_output(with_suffix(outfile, "_sort_by_name.fq"))
    else:
        perm = sort_perm_by_seq(batch)
        out = open_output(with_suffix(outfile, "_sort_by_seq.fq"))
    timer.log("done qsort file at %.3f s\n")
    emit_permuted(out, batch, perm)
    if out is not sys.stdout.buffer:
        out.close()
    else:
        out.flush()
    timer.log("done write file at %.3f s\n")
    return 0


def _usage() -> None:
    sys.stderr.write(
        "Usage: ngstpu gzfastq_sort [-i Infile] [-o OUTFILE] [-r reads_num] [-s|-n] [-h]\n"
        "   [-i Infile] = Infile.\n"
        "   [-o OUTPUT] = OUTPUT file. default is stdout\n"
        "   [-s ] sort by sequence.\n"
        "   [-n ] sort by sequence name.\n")
