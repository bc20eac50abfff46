#!/usr/bin/env python
"""Per-stage profile of the event-mode (WGS) and dense (small-genome)
bam2depth paths: wall + process CPU seconds per stage, run in isolation
over the bench fixtures. This is the measurement backing the inflate-floor
argument (VERDICT r3 item 1/2): each stage's core-seconds recorded
separately so the bench JSON can carry them.

Usage: python scripts/profile_pileup.py [wgs|small|both]
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def timed(fn, *args, **kw):
    w0, c0 = time.monotonic(), time.process_time()
    out = fn(*args, **kw)
    return out, time.monotonic() - w0, time.process_time() - c0


def profile(path: str, label: str) -> dict:
    from ngstpu.io.bgzf import _scan_blocks_ex
    from ngstpu.io.native import get_lib, format_int3_rows
    import ctypes

    lib = get_lib()
    res: dict = {"label": label, "path": path}

    # stage 0: raw file read (page-cache warm after first run)
    with open(path, "rb") as f:
        data, w, c = timed(f.read)
    res["read"] = {"wall": w, "cpu": c, "bytes": len(data)}

    # stage 1: BGZF header scan (python)
    (starts, lens, isizes, consumed), w, c = timed(_scan_blocks_ex, data)
    res["scan"] = {"wall": w, "cpu": c, "blocks": len(starts)}

    # stage 2: parallel inflate (native, all threads counted by
    # process_time) — the production raw-DEFLATE path (ngs_bgzf_inflate_
    # blocks); the out buffer is pre-touched so first-touch page faults
    # (an allocator artifact, not decode work) don't pollute the stage
    total = int(isizes.sum())
    out = np.empty(total, np.uint8)
    out[::4096] = 0
    offs = np.zeros(len(starts), np.int64)
    np.cumsum(isizes[:-1], out=offs[1:])
    sizes = np.empty(len(starts), np.int64)
    arr = np.frombuffer(data, np.uint8)
    starts = np.ascontiguousarray(starts)
    lens = np.ascontiguousarray(lens)
    isizes = np.ascontiguousarray(isizes)

    def inflate():
        return lib.ngs_bgzf_inflate_blocks(
            arr, starts, lens, len(starts), out, offs, isizes, sizes, 0, 0)
    rc, w, c = timed(inflate)
    assert rc == 0 and (sizes == isizes).all()
    res["inflate"] = {"wall": w, "cpu": c, "inflated_bytes": total}

    # single-thread inflate for the per-core number (min of 2: first draw
    # can land on a VM throughput trough)
    def inflate1():
        return lib.ngs_bgzf_inflate_blocks(
            arr, starts, lens, len(starts), out, offs, isizes, sizes, 0, 1)
    best = (None, 1e18, 1e18)
    for _ in range(2):
        rc, w, c = timed(inflate1)
        if c < best[2]:
            best = (rc, w, c)
    res["inflate_1t"] = {"wall": best[1], "cpu": best[2]}

    from ngstpu.io.bam import parse_header
    header, body_off = parse_header(out.tobytes()[:1 << 16])
    body = np.ascontiguousarray(out[body_off:])
    n_refs = header.n_refs

    # stage 3: record count walk
    n_rec = ctypes.c_int64(); n_cig = ctypes.c_int64()

    def count():
        return lib.ngs_bam_count(body, len(body), ctypes.byref(n_rec),
                                 ctypes.byref(n_cig))
    rc, w, c = timed(count)
    res["count"] = {"wall": w, "cpu": c, "records": n_rec.value,
                    "cigar_ops": n_cig.value}

    # stage 4: M-event extraction walk
    C = int(n_cig.value)
    tid_b = np.empty(C, np.int32)
    st_b = np.empty(C, np.int32)
    en_b = np.empty(C, np.int32)
    n_ev = ctypes.c_int64(); cons = ctypes.c_int64()
    mono = np.array([1, -1], np.int32)

    def mevents():
        return lib.ngs_bam_m_events(body, len(body), n_refs, 0x704, tid_b,
                                    st_b, en_b, C, ctypes.byref(n_ev),
                                    ctypes.byref(cons), mono)
    rc, w, c = timed(mevents)
    E = int(n_ev.value)
    res["m_events"] = {"wall": w, "cpu": c, "events": E}

    # stage 5: per-chrom split (searchsorted) — cheap, fold into sweep
    tids, ss, se = tid_b[:E], st_b[:E], en_b[:E]
    bounds = np.searchsorted(tids, np.arange(n_refs + 1))

    # stage 6: sweep per chromosome (native split radix sweep)
    def sweeps():
        outs = []
        for t in range(n_refs):
            lo, hi = int(bounds[t]), int(bounds[t + 1])
            ns = hi - lo
            if not ns:
                outs.append(None)
                continue
            u_pos = np.empty(2 * ns, np.int64)
            u_depth = np.empty(2 * ns, np.int64)
            k = lib.ngs_pileup_sweep_se(
                np.ascontiguousarray(ss[lo:hi]),
                np.ascontiguousarray(se[lo:hi]), ns, u_pos, u_depth, 0)
            outs.append((u_pos[:k], u_depth[:k]))
        return outs
    outs, w, c = timed(sweeps)
    res["sweep"] = {"wall": w, "cpu": c}

    # stage 7: interval extraction + row formatting
    from ngstpu.ops.bamops import _intervals_from_sweep

    def fmt():
        nb = 0
        for t, o in enumerate(outs):
            if o is None:
                continue
            st, en, dp = _intervals_from_sweep(o[0], o[1])
            rows = format_int3_rows(header.ref_names[t].encode(), st, en, dp)
            nb += len(rows)
        return nb
    nb, w, c = timed(fmt)
    res["format"] = {"wall": w, "cpu": c, "bytes": nb}
    return res


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    out = []
    if which in ("wgs", "both"):
        p = REPO / ".cache/bench/pileup_8388608_24x100000000.bam"
        out.append(profile(str(p), "wgs"))
    if which in ("small", "both"):
        p = REPO / ".cache/bench/pileup_1048576.bam"
        out.append(profile(str(p), "small"))
    for r in out:
        print(json.dumps(r, indent=1, default=float))


if __name__ == "__main__":
    main()
