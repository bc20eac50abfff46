"""bamSplitChr: split a BAM into one BAM per chromosome.

Parity target: reference bamSplitChr.c. Per chromosome j the output
"{outfile or bamfile}_{chrname}.bam" carries the FULL original header
(samopen "wbh", :117,130-131) and the records fetched for that chromosome
(all records with that tid, in file order). -u / -1 select compression
level 0 / 1 (:96-97). Records are copied byte-verbatim from the source
(re-encoding is unnecessary: BAM record payloads are position-independent).
"""

from __future__ import annotations

import getopt
import sys

import numpy as np

from ..io.bam import read_bam, write_bam
from ..utils.timing import StageTimer


def main(argv: list[str]) -> int:
    timer = StageTimer()
    outfile = None
    level = 6
    if not argv:
        _usage()
        return 1
    # C optString is "o:w:r:s:u:1:h?" — -u/-1 greedily consume a value; we
    # accept them valueless or with a value for compatibility.
    opts, files = getopt.gnu_getopt(argv, "o:w:r:s:u1h?")
    for flag, val in opts:
        if flag == "-o":
            outfile = val
        elif flag == "-u":
            level = 0
        elif flag == "-1":
            level = 1
        elif flag in ("-h", "-?"):
            _usage()
            return 1
    if not files:
        _usage()
        return 1

    for path in files:
        header, cols = read_bam(path)
        prefix = outfile if outfile else path
        body = cols.body
        for j, (name, tlen) in enumerate(zip(header.ref_names,
                                             header.ref_lens)):
            sel = np.flatnonzero(cols.tid == j)
            chunks = [body[int(cols.rec_offset[k]):
                           int(cols.rec_offset[k]) + int(cols.rec_len[k])]
                      for k in sel]
            rec_bytes = b"".join(c.tobytes() for c in chunks)
            write_bam(f"{prefix}_{name}.bam", header, rec_bytes, level=level)
            sys.stderr.write(
                f"chr: {name}\tchr_len: {tlen}\treads_count: {len(sel)} "
                f"at {timer.elapsed():.3f} s\n")
        sys.stderr.write(
            f"splited {path} into each chromosome at {timer.elapsed():.3f} s\n")
    return 0


def _usage() -> None:
    sys.stderr.write(
        "Usage: ngstpu bamSplitChr [-o OUTFILE_PREFIX] [-u] [-1] [-h] bam1 ...\n")
