"""fastq_count_kthread: map-reduce fastq_count — per-file TSVs + merged row.

Parity target: reference fastq_count_kthread.c. Each input file i writes
basename(file).{i}.tsv in the CWD (:264-266) holding the per-file stats row
(with filename column, :142) plus, with -L, the length detail and the FULL
128 x maxLen quality matrix dump (printQ :52-64, cycles 0..maxLen-1).
The merged summary (to -o / stdout) has no filename column (:202-203) and
its own -H header. The reference's kt_for work-stealing pool (klib
kthread.c:24-60) maps to a thread pool here; the reduction
(reduceStats :180-210) is the same histogram-matrix sum our device
accumulators produce.
"""

from __future__ import annotations

import getopt
import os
import sys
from concurrent.futures import ThreadPoolExecutor

from ..ops.count import QCAccumulator
from ..utils.timing import StageTimer
from .fastq_count import count_file


def _row_with_name(path: str, acc: QCAccumulator) -> str:
    s = acc.stats()
    return (f"{path}\t{s['read_count']}\t{s['base_count']:.0f}\t"
            f"{s['mean_len']:.0f}\t{s['min_len']}\t{s['max_len']}\t"
            f"{s['q20_pct']:.3f}\t{s['q30_pct']:.3f}\n")


def _detail(acc: QCAccumulator, min_len: int, max_len: int) -> str:
    idx = range(min_len, max_len + 1)
    out = "#Len:" + "".join(f"\t{i}" for i in idx) + "\n"
    out += "#Freq:" + "".join(f"\t{int(acc.seq_len[i])}" for i in idx) + "\n"
    # printQ: full quality matrix, 128 rows x max_len cols (cycles 0..max-1)
    q = acc.quality
    rows = []
    for r in range(128):
        rows.append("\t".join(str(int(v)) for v in q[r, :max_len]))
    return out + "\n".join(rows) + ("\n" if rows else "")


def main(argv: list[str]) -> int:
    timer = StageTimer()
    outfile, threads, header, length_detail = "-", 0, False, False
    opts, files = getopt.gnu_getopt(argv, "o:t:HLh?")
    for flag, val in opts:
        if flag == "-o":
            outfile = val
        elif flag == "-t":
            threads = int(val)
        elif flag == "-H":
            header = True
        elif flag == "-L":
            length_detail = True
        else:
            _usage()
            return 1
    if not files:
        _usage()
        return 1
    threads = max(1, min(threads or len(files), len(files)))

    if threads > 1:
        with ThreadPoolExecutor(max_workers=threads) as pool:
            accs = list(pool.map(count_file, files))
    else:
        accs = [count_file(f) for f in files]

    for i, (path, acc) in enumerate(zip(files, accs)):
        per_out_name = os.path.basename(path) + f".{i}.tsv"
        with open(per_out_name, "w") as per_out:
            if header:
                per_out.write("#Filename\tReadCount\tBaseCount\tMeanLen\t"
                              "MinLen\tMaxLen\tQ20(%)\tQ30(%)\n")
            per_out.write(_row_with_name(path, acc))
            if length_detail:
                s = acc.stats()
                per_out.write(_detail(acc, s["min_len"], s["max_len"]))

    total = QCAccumulator()
    for acc in accs:
        total.merge(acc)
    s = total.stats()
    out = sys.stdout if outfile.startswith("-") or outfile == "" else open(outfile, "w")
    if header:
        out.write("#ReadCount\tBaseCount\tMeanLen\tMinLen\tMaxLen\tQ20(%)\tQ30(%)\n")
    # reduce uses min over per-file minLens (start 10000, :182,189)
    min_len = min((a.stats()["min_len"] for a in accs), default=10000)
    max_len = max((a.stats()["max_len"] for a in accs), default=0)
    out.write(f"{s['read_count']}\t{s['base_count']:.0f}\t{s['mean_len']:.0f}\t"
              f"{min_len}\t{max_len}\t{s['q20_pct']:.3f}\t{s['q30_pct']:.3f}\n")
    if length_detail:
        out.write(_detail(total, min_len, max_len))
    if out is not sys.stdout:
        out.close()
    timer.log("Finished at %.3f s\n")
    return 0


def _usage() -> None:
    sys.stderr.write(
        "Usage: ngstpu fastq_count_kthread file1.fq ... [-o outfile] [-t thread] [-H] [-L] [-h]\n")
