"""gzfastq_uniqQ: SE dedup keeping EVERY (name, quality) per unique sequence.

Parity target: reference gzfastq_uniqQ.c. The per-sequence list is built
with list prepend (:58-65, 229), so the stored head is the LAST occurrence;
the output record is "{name of last occurrence}\\t{count}\\n{key}\\n+\\n"
followed by one quality line per occurrence in reverse input order
(printSortedDict :78-92). Order: -S (default) key-ascending (sdscmp),
-C count-descending. Output file: outfile + "_sortKeyUniq.fq".
"""

from __future__ import annotations

import getopt
import sys

import numpy as np
import jax.numpy as jnp

from ..io.fastq import read_fastq_file
from ..io.stream import open_output, with_suffix
from ..ops.sortengine import dedup_groups, pack_for_dedup
from ..utils.timing import StageTimer


def main(argv: list[str]) -> int:
    timer = StageTimer()
    read1, outfile = "-", "-"
    sort_by_seq = True
    if not argv:
        _usage()
        return 1
    opts, _ = getopt.gnu_getopt(argv, "1:o:CSh?")
    for flag, val in opts:
        if flag == "-1":
            read1 = val
        elif flag == "-o":
            outfile = val
        elif flag == "-S":
            sort_by_seq = True
        elif flag == "-C":
            sort_by_seq = False
        elif flag in ("-h", "-?"):
            _usage()
            return 1

    batch = read_fastq_file(read1)
    n = batch.n
    words, encode_len = pack_for_dedup(batch.seq)
    # sumq=0 -> members ordered by input index within each group
    g = dedup_groups(words, jnp.asarray(batch.lens),
                     jnp.zeros(n, jnp.uint32), n, length_first=False,
                     words_encode_len=encode_len)
    perm = g["perm"]
    n_groups = g["n_groups"]
    sys.stderr.write(
        f"unique reads number = {n_groups}({n_groups} / {n} = "
        f"{100.0 * n_groups / n:.3f}%)\n" if n else "")
    timer.log("Finished load hash at %.3f s\n")

    head_pos = g["head_pos"]                      # [G] sorted-row index
    counts = g["counts"]
    if not sort_by_seq:
        order = np.argsort(-counts.astype(np.int64), kind="stable")
    else:
        order = np.arange(len(head_pos))

    out = open_output(with_suffix(outfile, "_sortKeyUniq.fq"))
    write = out.write
    for g in order:
        hp = int(head_pos[g])
        c = int(counts[g])
        members = perm[hp:hp + c]                 # input-index ascending
        last = int(members[-1])
        key_i = int(members[0])                   # first occurrence == key
        write(batch.name(last) + b"\t%d\n" % c)
        write(batch.seq_bytes(key_i) + b"\n+\n")
        for m in members[::-1]:
            write(batch.qual_bytes(int(m)) + b"\n")
    if out is not sys.stdout.buffer:
        out.close()
    else:
        out.flush()
    timer.log("Finished  at %.3f s\n")
    return 0


def _usage() -> None:
    sys.stderr.write(
        "Usage: ngstpu gzfastq_uniqQ [-1 READ1] [-C sort by count] [-S sort by seq] [-o OUTFILE] [-h]\n")
