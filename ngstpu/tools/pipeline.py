"""pipeline: fused count + trim + uniq over a single pass of the input.

The reference runs fastq_count, fastq_trim and gzfastq_uniq as three
processes, each re-reading (and re-decompressing) the file
(fastq_count.c:106-133, fastq_trim.c:67-108, gzfastq_uniq.c:194-281). The
TPU-native pipeline reads once and runs the QC histogram, the trim slice
and the dedup sort as one overlapped schedule — outputs are identical to
running the three tools separately.

Fast path (plain files, ACGT data, native lib): the input is mmap'd and
indexed in place (io/fastindex.py); ONE fused native pass computes the QC
histograms, quality sums and 2-bit device sort keys while the trim output
is assembled straight from the raw bytes and written by a background
thread; the dedup runs as P key-range partitions on the device so the
emit of partition k overlaps the sort of partition k+1; the duplicate
_sortKeyUniq.fq output is a kernel-side copy_file_range clone. The generic
path (stdin/gzip/wide alphabets) is the chunked padded-batch pipeline.

Usage: ngstpu pipeline -i in.fq -o prefix [-s start] [-e end]
Outputs: {prefix}.count.tsv, {prefix}.trim.fastq, {prefix}_uniq.fq,
{prefix}_sortKeyUniq.fq.
"""

from __future__ import annotations

import getopt
import os
import queue
import sys
import threading

import numpy as np
import jax.numpy as jnp

from ..io.fastq import format_fastq
from ..ops.count import QCAccumulator
from ..ops.sortengine import sum_quality_host
from ..utils.timing import StageTimer
from .fastq_count import _row
from .fastq_trim import trim_batch
from .gzfastq_uniq import _emit

N_PARTS = 4
CHUNK_RECORDS = 1 << 19


class _RingWriter:
    """Background single-file writer fed from a ring of pooled buffers.

    The producer borrows a buffer name via `acquire()`, fills it, and
    `submit()`s (view, nbytes); the writer thread writes and returns the
    name to the free ring — formatting chunk k+1 overlaps writing chunk k
    without ever copying the text (the kt_pipeline overlap of reference
    klib/kthread.c:83-143 on the output side)."""

    def __init__(self, sink, names: list[str]):
        self._sink = sink
        self._free: "queue.Queue[str]" = queue.Queue()
        for n in names:
            self._free.put(n)
        self._work: "queue.Queue[tuple | None]" = queue.Queue()
        self._err: BaseException | None = None
        self._t = threading.Thread(target=self._drain, daemon=True)
        self._t.start()

    def acquire(self) -> str:
        return self._free.get()

    def submit(self, name: str, view: np.ndarray, nbytes: int) -> None:
        self._work.put((name, view, nbytes))

    def _drain(self) -> None:
        while True:
            item = self._work.get()
            if item is None:
                return
            name, view, nbytes = item
            if self._err is None:
                try:
                    self._sink.write(memoryview(view[:nbytes]))
                except BaseException as e:
                    self._err = e
            self._free.put(name)

    def close(self) -> None:
        if self._t is not None:
            self._work.put(None)
            self._t.join()
            self._t = None
        if self._err is not None:
            err, self._err = self._err, None
            raise err


class _CloningSink:
    """Write each block to f1 and kernel-clone the written range into f2
    (the two uniq outputs are byte-identical; copy_file_range avoids a
    second user-space pass over the text). Falls back to a plain double
    write where copy_file_range is unsupported."""

    def __init__(self, f1, f2):
        self._f1, self._f2 = f1, f2
        self._off = 0
        self._cfr = hasattr(os, "copy_file_range")

    def write(self, mv) -> None:
        n = len(mv)
        self._f1.write(mv)
        done = 0
        if self._cfr:
            try:
                while done < n:
                    k = os.copy_file_range(
                        self._f1.fileno(), self._f2.fileno(), n - done,
                        self._off + done, self._off + done)
                    if k == 0:
                        break
                    done += k
            except OSError:
                self._cfr = False
        if done < n:
            self._f2.seek(self._off + done)
            self._f2.write(mv[done:])
        self._off += n


def _fresh(path: str) -> str:
    """Unlink `path` before (re)creating it: truncate-open of a file whose
    pages are still dirty in cache forces synchronous invalidation (up to
    ~0.7s per 300MB output measured here); unlinking instead lets the
    kernel drop the old inode's dirty pages in the background."""
    try:
        os.unlink(path)
    except OSError:
        pass
    return path


def _partition_bounds(bucket_hist: np.ndarray, n_parts: int) -> np.ndarray:
    """Key-range split points (leading packed byte) giving ~equal rows."""
    cum = np.cumsum(bucket_hist.astype(np.int64))
    total = int(cum[-1])
    targets = (np.arange(1, n_parts) * total) // n_parts
    return np.searchsorted(cum, targets).astype(np.uint32)


def run_fast(fused, infile: str, prefix: str, start: int, end: int,
             timer: StageTimer) -> dict | None:
    """Offset-indexed overlapped pipeline over the one-sweep
    index_fastq_fused result. Returns None when the data is not pure ACGT
    (caller falls back to the generic path)."""
    from ..io.fastindex import trim_text
    from ..utils.bufpool import get_buffer

    ix, words_all, sumq_all, hist_q, hist_len, bucket, ok = fused
    if not ok:
        return None
    B = ix.n
    lmax = int(ix.seq_len.max()) if B else 0
    W = words_all.shape[1]

    # dispatch the dedup sort FIRST: its inputs (packed words, quality
    # sums) are complete the moment the fused index pass returns, so the
    # device sorts (or the host sort thread) run concurrently with the
    # whole trim-assembly loop below instead of starting after it
    const_len = B > 0 and int(ix.seq_len.min()) == lmax
    from ..utils.linkprobe import link_verdict, probe_link

    verdict = link_verdict()
    if verdict is None:
        verdict = probe_link(words_all)
    if verdict == "host":
        rep_groups = _sort_host_async(words_all, ix.seq_len, sumq_all,
                                      const_len)
    else:
        rep_groups = _sort_device_async(words_all, ix.seq_len, sumq_all,
                                        bucket, const_len, W)

    # trim: text assembled straight from the raw bytes per chunk and
    # written by the ring writer (formatting chunk k+1 overlaps writing k)
    cl = np.clip(np.minimum(ix.seq_len.astype(np.int64), end) - start, 0,
                 None)
    trim_rec = ix.name_len.astype(np.int64) + 1 + cl + 3 + cl + 1
    chunk_trim_cap = 1
    for lo in range(0, B, CHUNK_RECORDS):
        chunk_trim_cap = max(chunk_trim_cap,
                             int(trim_rec[lo:lo + CHUNK_RECORDS].sum()))
    ring_names = ["pipe.trim0", "pipe.trim1", "pipe.trim2"]
    tf = open(_fresh(prefix + ".trim.fastq"), "wb")
    trim_writer = _RingWriter(tf, ring_names)
    try:
        for lo in range(0, B, CHUNK_RECORDS):
            hi = min(lo + CHUNK_RECORDS, B)
            name = trim_writer.acquire()
            buf = get_buffer(name, chunk_trim_cap)
            total = trim_text(ix, lo, hi, start, end, buf)
            trim_writer.submit(name, buf, total)
        timer.checkpoint("parse")
        # the trim writer keeps draining in the background: the trim file
        # write overlaps the dedup sort + uniq emit below (it only gates
        # the final return, where close() joins and surfaces any IO error)

        acc = QCAccumulator.from_host_partials(hist_q, hist_len)
        with open(prefix + ".count.tsv", "w") as out:
            out.write(_row(infile, acc))
        timer.checkpoint("dispatch")

        # stream the emit: format/write group block k while block k+1 is
        # still sorting (device) or while the writer drains (host); the
        # duplicate output is cloned range-by-range kernel-side per block
        n_groups = 0
        from ..io.fastindex import uniq_text

        uniq_path = prefix + "_uniq.fq"
        with open(_fresh(uniq_path), "wb", buffering=0) as uf, \
                open(_fresh(prefix + "_sortKeyUniq.fq"), "wb",
                     buffering=0) as cf:
            writer = _RingWriter(_CloningSink(uf, cf), ["pipe.emit0",
                                                        "pipe.emit1"])
            try:
                for rep, counts in rep_groups:
                    n_groups += len(rep)
                    if len(rep) == 0:
                        continue
                    name = writer.acquire()
                    view, total = uniq_text(ix, rep, counts, name)
                    writer.submit(name, view, total)
            finally:
                writer.close()
    finally:
        try:
            trim_writer.close()
        finally:
            tf.close()
    timer.checkpoint("uniq_write")
    return dict(n=B, n_groups=n_groups, stages=dict(timer.stages))


def _sort_host_async(words_all: np.ndarray, key_lens: np.ndarray,
                     sumq_all: np.ndarray, const_len: bool):
    """Host placement of the dedup sort (thin accelerator link): ONE native
    call fuses the bucketed parallel sort with group/representative/count
    extraction (each bucket's groups are scanned while its rows are still
    cache-hot). The call runs on a background thread STARTED NOW (ctypes
    releases the GIL), so it fills the CPU stalls of the trim loop's ring
    writer; the returned generator joins, then yields group blocks."""
    import ctypes
    import threading

    from ..io.native import get_lib
    from ..utils.bufpool import get_buffer

    B = len(words_all)
    lib = get_lib()
    perm = get_buffer("pipe.perm", 4 * B, np.int32)[:B]
    rep = get_buffer("pipe.rep", 8 * B, np.int64)[:B]
    counts = get_buffer("pipe.cnt", 8 * B, np.int64)[:B]
    lens = np.ascontiguousarray(key_lens, np.int32)
    box: list = []

    def run():
        try:
            box.append(lib.ngs_dedup_groups_host(
                words_all, lens.ctypes.data_as(ctypes.c_void_p), sumq_all,
                0 if const_len else 1, B, words_all.shape[1], perm, rep,
                counts, 0))
        except BaseException as e:  # pragma: no cover - surfaced on join
            box.append(e)

    t = threading.Thread(target=run, daemon=True)
    t.start()

    def gen():
        t.join()
        if box and isinstance(box[0], BaseException):
            raise box[0]
        g = box[0]
        step = 1 << 19
        for lo in range(0, g, step):
            hi = min(lo + step, g)
            yield rep[lo:hi], counts[lo:hi]

    return gen()


def _sort_device_async(words_all: np.ndarray, key_lens: np.ndarray,
                       sumq_all: np.ndarray, bucket: np.ndarray,
                       const_len: bool, W: int):
    """Device placement: partition rows by leading packed byte (prefix
    order == sdscmp order on the 2-bit alphabet) and dispatch one async
    LSD sort per partition IMMEDIATELY — the device sorts all partitions
    while the caller's trim loop runs; the returned generator then yields
    each partition's groups as its results land (the emit of partition p
    still overlaps the pull of partition p+1)."""
    from ..ops.sortengine import rep_counts_host, sort_partition
    from ..utils.bufpool import get_buffer, get_matrix

    B = len(words_all)
    bounds = _partition_bounds(bucket, N_PARTS)
    top = words_all[:, 0] >> np.uint32(24) if B else np.zeros(0, np.uint32)
    part = np.searchsorted(bounds, top, side="right")
    handles = []
    for p in range(N_PARTS):
        idx_p = np.flatnonzero(part == p).astype(np.int64)
        n_p = len(idx_p)
        if n_p == 0:
            continue
        cap = -(-n_p // (256 << 10)) * (256 << 10)
        stage = get_matrix(f"pipe.stage{p}", cap, W, np.uint32)
        np.take(words_all, idx_p, axis=0, out=stage[:n_p])
        if cap > n_p:
            stage[n_p:] = 0
        w_dev = jnp.asarray(stage)
        if const_len:
            l_dev = jnp.zeros((cap,), jnp.int32)
        else:
            lstage = get_buffer(f"pipe.lens{p}", 4 * cap, np.int32)
            np.take(np.asarray(key_lens, np.int32), idx_p,
                    out=lstage[:n_p])
            if cap > n_p:
                lstage[n_p:] = 0
            l_dev = jnp.asarray(lstage)
        perm, is_head = sort_partition(w_dev, l_dev, jnp.int32(n_p),
                                       length_key=not const_len,
                                       maybe_padding=cap > n_p)
        handles.append((perm, is_head, idx_p, n_p))

    def gen():
        for perm_d, is_head_d, idx_p, n_p in handles:
            perm = np.asarray(perm_d)[:n_p]
            is_head = np.asarray(is_head_d)[:n_p]
            rep_local, counts = rep_counts_host(perm, is_head, n_p,
                                                sumq_all[idx_p])
            yield idx_p[rep_local], counts

    return gen()


def run_generic(infile: str, prefix: str, start: int, end: int,
                timer: StageTimer) -> dict:
    from ..io.fastq import FastqChunkReader, concat_batches
    from ..ops.sortengine import (classify_alphabet, dedup_sorted,
                                  pack_for_dedup, pack_words_host)

    # Parse chunk-by-chunk, overlapping host decode with device transfers:
    # each chunk's quality histogram is dispatched and its packed sort
    # words shipped while the reader inflates the next chunk. Sort keys use
    # the narrowest packing the first chunk's alphabet allows (2-bit for
    # pure ACGT); a later chunk with a wider alphabet forces one consistent
    # repack of the whole batch at the end (rare: N-containing tails).
    acc = QCAccumulator()
    batches = []
    word_chunks = []
    sumq_parts = []
    kind: str | None = None
    mixed = False
    for chunk in FastqChunkReader(infile):
        acc.add_batch(chunk.qual, chunk.lens, chunk.n)
        sumq_parts.append(sum_quality_host(chunk.qual))
        if not mixed:
            k = classify_alphabet(chunk.seq)
            if kind is None:
                kind = k
            if k == kind:
                word_chunks.append(jnp.asarray(pack_words_host(chunk.seq,
                                                               kind)))
            else:
                mixed = True
        batches.append(chunk)
    batch = concat_batches(batches)
    timer.checkpoint("parse")

    if not mixed and word_chunks:
        wmax = max(w.shape[1] for w in word_chunks)
        words = jnp.concatenate(
            [jnp.pad(w, ((0, 0), (0, wmax - w.shape[1])))
             if w.shape[1] != wmax else w for w in word_chunks])
        encode_len = kind == "dna3"
    else:
        # alphabet widened mid-file: one consistent repack
        words, encode_len = pack_for_dedup(batch.seq)
    sumq = jnp.asarray(np.concatenate(sumq_parts) if sumq_parts
                       else np.zeros(0, np.uint32))
    res = dedup_sorted(words, jnp.asarray(batch.lens), sumq,
                       jnp.int32(batch.n), length_first=False,
                       words_encode_len=encode_len, maybe_padding=False)
    timer.checkpoint("dispatch")

    # 2) trim (host slice + write) overlaps the device sort; the threaded
    # writer overlaps formatting chunk k+1 with writing chunk k
    from ..io.native import format_fastq_take
    from ..utils.iopipe import TeeWriter

    seq_t, qual_t, lens_t = trim_batch(batch, start, end)
    seq_t = np.ascontiguousarray(seq_t)
    qual_t = np.ascontiguousarray(qual_t)
    with open(prefix + ".trim.fastq", "wb") as f:
        tee = TeeWriter([f])
        try:
            step = 1 << 18
            done = False
            for lo in range(0, batch.n, step):
                idx = np.arange(lo, min(lo + step, batch.n), dtype=np.int64)
                text = format_fastq_take(
                    batch.names, batch.name_starts, batch.name_lens, idx,
                    None, seq_t, lens_t, idx, qual_t, lens_t, idx)
                if text is None:
                    break
                tee.write(text)
            else:
                done = True
        finally:
            tee.close()
        if not done:  # no native lib: single formatted write
            f.seek(0)
            f.truncate()
            f.write(format_fastq(batch.names, batch.name_starts,
                                 batch.name_lens, seq_t, qual_t, lens_t))
    timer.checkpoint("trim_write")

    # 3) pull dedup results, group math on host
    perm = np.asarray(res["perm"])
    is_head = np.asarray(res["is_head"])
    timer.checkpoint("dedup_pull")
    head_pos = np.flatnonzero(is_head)
    counts = np.diff(np.concatenate([head_pos, [batch.n]]))
    rep = perm[head_pos]
    n_groups = len(head_pos)

    with open(prefix + ".count.tsv", "w") as out:
        out.write(_row(infile, acc))

    # the two uniq outputs are identical records in identical order (we
    # emit key-sorted for both) — format once, write both concurrently;
    # the tee threads overlap the two file writes with formatting
    with open(prefix + "_uniq.fq", "wb") as f1, \
            open(prefix + "_sortKeyUniq.fq", "wb") as f2:
        tee = TeeWriter([f1, f2])
        try:
            _emit(tee, batch, rep, counts)
        finally:
            tee.close()
    timer.checkpoint("uniq_write")
    return dict(n=batch.n, n_groups=n_groups,
                stages=dict(timer.stages))


def run(infile: str, prefix: str, start: int, end: int,
        timer: StageTimer | None = None) -> dict:
    timer = timer or StageTimer()
    if not os.environ.get("NGSTPU_NO_FASTPATH"):
        from ..io.fastindex import index_fastq_fused

        fused = index_fastq_fused(infile, pool="pipe")
        if fused is not None:
            info = run_fast(fused, infile, prefix, start, end, timer)
            if info is not None:
                return info
            # non-ACGT alphabet: rerun on the generic chunked path
    return run_generic(infile, prefix, start, end, timer)


def main(argv: list[str]) -> int:
    timer = StageTimer()
    infiles, prefix, start, end = [], "out", 0, 400
    opts, extra = getopt.gnu_getopt(argv, "i:o:s:e:h?")
    for flag, val in opts:
        if flag == "-i":
            infiles.append(val)
        elif flag == "-o":
            prefix = val
        elif flag == "-s":
            start = int(val)
        elif flag == "-e":
            end = int(val)
        elif flag in ("-h", "-?"):
            sys.stderr.write(
                "Usage: ngstpu pipeline -i in.fq [-i in2.fq ...] -o prefix"
                " [-s start] [-e end]\n"
                "  multi-lane runs share one process: compiled programs are\n"
                "  reused and the next lane's bytes prefetch in background\n")
            return 1
    infiles += extra
    if not infiles:
        infiles = ["-"]

    def prefetch(path):
        try:
            with open(path, "rb") as f:  # warm the page cache
                while f.read(32 << 20):
                    pass
        except OSError:
            pass

    for k, infile in enumerate(infiles):
        if k + 1 < len(infiles) and infiles[k + 1] != "-":
            threading.Thread(target=prefetch, args=(infiles[k + 1],),
                             daemon=True).start()
        out_prefix = prefix if len(infiles) == 1 else f"{prefix}.{k + 1}"
        info = run(infile, out_prefix, start, end, timer)
        sys.stderr.write(f"{infile}: reads: {info['n']}\n"
                         f"unique: {info['n_groups']}\n")
    timer.log("Finished at %.3f s\n")
    return 0
