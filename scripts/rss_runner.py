#!/usr/bin/env python
"""Small-footprint command runner: wall-time + peak RSS per command.

Run as its own process. Linux ru_maxrss is a high-water mark that
includes the fork→exec COW window, during which the child's resident set
IS the parent's — so any child forked from a fat benchmark driver
reports at least the driver's RSS (observed: a no-op child "peaking" at
30GB after fixture generation). This runner stays tiny (stdlib only), so
the watermark it imprints on its children is negligible.

Two numbers per command:
- peak_rss_mb: ru_maxrss from os.wait4 (total resident high-water,
  INCLUDING file-backed mmap pages — page cache the kernel can evict).
- peak_anon_mb: max (RssAnon + RssShmem) sampled from
  /proc/<pid>/status at 50ms — the process's own heap + anonymous-map
  footprint (RssShmem covers MAP_ANONYMOUS|MAP_SHARED pool buffers,
  which RssAnon alone would hide), the honest comparison point against
  a malloc-based tool's envelope. Excludes only file-backed mmap pages
  (page cache the kernel can evict).

argv[1] = JSON {"cmds": [[...], ...], "cwd": str|null, "env": {k: v}}
stdout  = JSON [[seconds, peak_rss_mb, peak_anon_mb, exit_code], ...]
"""
import json
import os
import subprocess
import sys
import time


def main() -> None:
    spec = json.loads(sys.argv[1])
    env = {**os.environ, **spec.get("env", {})}
    out = []
    for cmd in spec["cmds"]:
        t0 = time.monotonic()
        p = subprocess.Popen(cmd, cwd=spec.get("cwd"), env=env,
                             stdout=subprocess.DEVNULL,
                             stderr=subprocess.DEVNULL)
        peak_anon = 0.0
        while True:
            pid_done, status, ru = os.wait4(p.pid, os.WNOHANG)
            if pid_done == p.pid:
                break
            try:
                cur = 0.0
                with open(f"/proc/{p.pid}/status") as f:
                    for line in f:
                        if line.startswith(("RssAnon:", "RssShmem:")):
                            cur += int(line.split()[1]) / 1024.0
                peak_anon = max(peak_anon, cur)
            except OSError:
                pass
            time.sleep(0.05)
        p.returncode = os.waitstatus_to_exitcode(status)
        out.append([time.monotonic() - t0, ru.ru_maxrss / 1024.0,
                    peak_anon, p.returncode])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
