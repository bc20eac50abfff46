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
    """Write records of `batch` in `perm` order (fused native gather+format,
    chunked fallback)."""
    from ..io.native import format_fastq_take

    if len(perm):
        text = format_fastq_take(batch.names, batch.name_starts,
                                 batch.name_lens, perm, None,
                                 batch.seq, batch.lens, perm,
                                 batch.qual, batch.lens, perm)
        if text is not None:
            out.write(text)
            return
    for lo in range(0, len(perm), OUT_CHUNK):
        sub = batch.take(perm[lo:lo + OUT_CHUNK])
        out.write(format_fastq(sub.names, sub.name_starts, sub.name_lens,
                               sub.seq, sub.qual, sub.lens))


def _mesh_perm(words_host: np.ndarray, lens: np.ndarray,
               mesh_n: int) -> np.ndarray | None:
    """Distributed sample-sort when -m requests a mesh (parallel/dsort.py);
    None -> caller runs the single-chip path."""
    import jax

    from ..parallel.dsort import distributed_sort
    from ..parallel.mesh import make_mesh

    n = min(mesh_n, len(jax.devices()))
    if n <= 1:
        return None
    return distributed_sort(make_mesh(n), words_host,
                            np.asarray(lens, np.int32), length_first=True)


def sort_perm_by_seq(batch, mesh_n: int = 0) -> np.ndarray:
    if mesh_n > 1:
        from ..ops.sortengine import seq_words_host

        perm = _mesh_perm(seq_words_host(batch.seq), batch.lens, mesh_n)
        if perm is not None:
            return perm
    words = seq_words(batch.seq)
    return np.asarray(lex_argsort(words, jnp.asarray(batch.lens),
                                  length_first=True))


def sort_perm_by_name(batch, mesh_n: int = 0) -> np.ndarray:
    lmax = max(int(batch.name_lens.max(initial=0)), 4)
    lmax = (lmax + 3) // 4 * 4
    padded = fill_padded(batch.names, batch.name_starts, batch.name_lens, lmax)
    if mesh_n > 1:
        from ..ops.sortengine import bytes_to_words_host

        perm = _mesh_perm(bytes_to_words_host(padded), batch.name_lens, mesh_n)
        if perm is not None:
            return perm
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
    import os

    mesh_n = int(os.environ.get("NGSTPU_MESH", "0"))
    opts, _ = getopt.gnu_getopt(argv, "i:o:r:m:nsh?")
    for flag, val in opts:
        if flag == "-i":
            infile = val
        elif flag == "-o":
            outfile = val
        elif flag == "-r":
            pass  # preallocation hint: unnecessary here
        elif flag == "-m":
            mesh_n = int(val)
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
        perm = sort_perm_by_name(batch, mesh_n)
        out = open_output(with_suffix(outfile, "_sort_by_name.fq"))
    else:
        perm = sort_perm_by_seq(batch, mesh_n)
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
        "   [-m MESH] shard the sort over a MESH-device dp mesh"
        " (ngstpu extension; env NGSTPU_MESH).\n"
        "   [-n ] sort by sequence name.\n")
