"""Compile-and-run harness for the reference C tools (golden oracles).

The reference has no tests of its own (SURVEY.md §4); our parity strategy is
differential: compile the unmodified reference sources out-of-tree into
.cache/oracles/ (never committed) and byte-compare outputs. Tools that only
need zlib/pthread compile directly; the BAM trio needs vendored samtools and
is built lazily from the reference tarball.
"""

from __future__ import annotations

import pathlib
import shutil
import subprocess

REF = pathlib.Path("/root/reference")
REPO = pathlib.Path(__file__).resolve().parents[2]
ORACLE_DIR = REPO / ".cache" / "oracles"

# tool -> (sources, extra flags). All compiled with -I$REF -lz.
SIMPLE_TOOLS: dict[str, tuple[list[str], list[str]]] = {
    "fastq_count": (["fastq_count.c"], ["-lpthread"]),
    "fastq_trim": (["fastq_trim.c"], []),
    "pick_pair": (["pick_pair.c"], []),
    "gzfastq_sort": (["gzfastq_sort.c"], []),
    "gzfastq_sort_list": (["gzfastq_sort_list.c", "list.c"], []),
    "gzfastq_uniq": (["gzfastq_uniq.c", "hiredis/dict.c", "hiredis/sds.c"], []),
    "gzfastq_uniqQ": (["gzfastq_uniqQ.c", "hiredis/dict.c", "hiredis/sds.c",
                       "list.c"], []),
    "gzfastq_uniq_sort": (["gzfastq_uniq_sort.c", "hashtbl.c"], []),
    "gzfastq_mrle": (["gzfastq_mrle.c", "list.c"], []),
    "fastq2twobit": (["fastq2twobit.c", "hiredis/sds.c", "list.c"], []),
    "twoBit2seq": (["twoBit2seq.c", "hiredis/sds.c"], []),
    "fastq_count_kthread": (["fastq_count_kthread.c", "klib/kthread.c"],
                            ["-lpthread"]),
}

_FASTQ_TOOLS_SRC = "fastq-tools-0.7"
_SAMTOOLS_SRC = "samtools-0.1.19"
BAM_TOOLS = {"bam2depth": ["bam2depth.c", "hashtbl.c"],
             "bam2wig": ["bam2wig.c", "hashtbl.c"],
             "bamSplitChr": ["bamSplitChr.c"],
             "bam_sliding_count": ["bam_sliding_count.c"]}


def _samtools_dir() -> pathlib.Path | None:
    """Extract + build the vendored samtools (libbam.a + samtools binary)."""
    vendor = REPO / ".cache" / "ref-vendor"
    d = vendor / _SAMTOOLS_SRC
    if (d / "libbam.a").exists() and (d / "samtools").exists():
        return d
    vendor.mkdir(parents=True, exist_ok=True)
    try:
        if not d.exists():
            subprocess.run(["tar", "xjf", str(REF / "samtools-0.1.19.tar.bz2")],
                           cwd=vendor, check=True, timeout=120)
        subprocess.run(
            ["make", "-j2", "samtools",
             "DFLAGS=-D_FILE_OFFSET_BITS=64 -D_LARGEFILE64_SOURCE "
             "-D_USE_KNETFILE -D_CURSES_LIB=0", "LIBCURSES="],
            cwd=d, check=True, capture_output=True, timeout=600)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, OSError):
        return None
    return d if (d / "libbam.a").exists() else None


_GD_STUB_H = """\
/* minimal no-op libgd stub for oracle builds (PNG output not compared) */
#ifndef GD_STUB_H
#define GD_STUB_H
#include <stdio.h>
#include <stdlib.h>
typedef struct { int w, h; } gdImage;
typedef gdImage* gdImagePtr;
typedef struct { int n; } gdFont;
typedef gdFont* gdFontPtr;
static gdImagePtr gdImageCreate(int w, int h){ gdImagePtr p = (gdImagePtr)malloc(sizeof(gdImage)); p->w=w; p->h=h; return p; }
static int gdImageColorExact(gdImagePtr im, int r, int g, int b){ (void)im; return (r<<16)|(g<<8)|b; }
static void gdImageColorDeallocate(gdImagePtr im, int c){ (void)im; (void)c; }
static int gdImageColorAllocate(gdImagePtr im, int r, int g, int b){ (void)im; return (r<<16)|(g<<8)|b; }
static void gdImageString(gdImagePtr im, gdFontPtr f, int x, int y, unsigned char *s, int c){}
static void gdImageRectangle(gdImagePtr im, int x1,int y1,int x2,int y2,int c){}
static void gdImageFilledRectangle(gdImagePtr im, int x1,int y1,int x2,int y2,int c){}
static void gdImageSetPixel(gdImagePtr im, int x, int y, int c){}
static void gdImagePng(gdImagePtr im, FILE *f){}
static void gdImageDestroy(gdImagePtr im){ free(im); }
#endif
"""

_GD_FONT_STUB_H = """\
#ifndef GDFONTG_STUB_H
#define GDFONTG_STUB_H
#include "gd.h"
static gdFont gd_stub_font = {0};
static gdFontPtr gdFontGetGiant(void){ return &gd_stub_font; }
#endif
"""


def _write_gd_stub(stub_dir: pathlib.Path) -> None:
    stub_dir.mkdir(parents=True, exist_ok=True)
    for name, text in (("gd.h", _GD_STUB_H), ("gdfontg.h", _GD_FONT_STUB_H)):
        f = stub_dir / name
        if not f.exists():
            f.write_text(text)


def samtools_exe() -> str | None:
    d = _samtools_dir()
    return str(d / "samtools") if d and (d / "samtools").exists() else None


def _build_bam_tool(tool: str) -> str | None:
    exe = ORACLE_DIR / tool
    d = _samtools_dir()
    if d is None:
        return None
    srcs = [str(REF / s) for s in BAM_TOOLS[tool]]
    extra = []
    if tool == "bam_sliding_count":
        # PNG rendering is not part of the parity surface; build the oracle
        # against a no-op libgd stub so only the .txt output is exercised.
        stub = REPO / ".cache" / "gdstub"
        _write_gd_stub(stub)
        extra = [f"-I{stub}"]
    cmd = [_cc(), "-O2", "-w", "-o", str(exe)] + srcs + extra + [
        f"-I{REF}", f"-I{d}", str(d / "libbam.a"), "-lz", "-lpthread", "-lm"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
    except subprocess.CalledProcessError:
        return None
    return str(exe) if exe.exists() else None


def have_toolchain() -> bool:
    return shutil.which("gcc") is not None or shutil.which("cc") is not None


def _cc() -> str:
    return shutil.which("gcc") or shutil.which("cc")  # type: ignore[return-value]


def build_oracle(tool: str) -> str | None:
    """Build a reference tool; returns binary path or None if unavailable."""
    ORACLE_DIR.mkdir(parents=True, exist_ok=True)
    exe = ORACLE_DIR / tool
    if exe.exists():
        return str(exe)
    if not have_toolchain():
        return None
    if tool == "gzfastq_sample":
        return _build_gzfastq_sample()
    if tool in BAM_TOOLS:
        return _build_bam_tool(tool)
    if tool not in SIMPLE_TOOLS:
        return None
    srcs, extra = SIMPLE_TOOLS[tool]
    cmd = [_cc(), "-O2", "-w", "-o", str(exe)] + \
        [str(REF / s) for s in srcs] + [f"-I{REF}", f"-I{REF}/hiredis",
                                        f"-I{REF}/klib", "-lz", "-lm"] + extra
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired):
        return None
    return str(exe) if exe.exists() else None


def _build_gzfastq_sample() -> str | None:
    """gzfastq_sample needs fastq-tools rng.c + common.c from the tarball."""
    exe = ORACLE_DIR / "gzfastq_sample"
    vendor = REPO / ".cache" / "ref-vendor"
    src_dir = vendor / _FASTQ_TOOLS_SRC / "src"
    if not src_dir.exists():
        vendor.mkdir(parents=True, exist_ok=True)
        tarball = REF / "fastq-tools-0.7.tar.gz"
        try:
            subprocess.run(["tar", "xzf", str(tarball)], cwd=vendor,
                           check=True, timeout=60)
        except subprocess.CalledProcessError:
            return None
    # common.c needs config.h/version.h; synthesize minimal ones.
    for hdr, text in (("config.h", '#define VERSION "0.7"\n'),
                      ("version.h",
                       '#define FASTQ_TOOLS_VERSION "0.7"\n')):
        f = src_dir / hdr
        if not f.exists():
            f.write_text(text)
    cmd = [_cc(), "-O2", "-w", "-DHAVE_CONFIG_H", "-o", str(exe),
           str(REF / "gzfastq_sample.c"), str(src_dir / "rng.c"),
           str(src_dir / "common.c"),
           f"-I{REF}", f"-I{src_dir}", "-lz", "-lm"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except subprocess.CalledProcessError:
        return None
    return str(exe) if exe.exists() else None


def run_oracle(tool: str, args: list[str], cwd: str,
               stdin: bytes | None = None) -> subprocess.CompletedProcess | None:
    exe = build_oracle(tool)
    if exe is None:
        return None
    return subprocess.run([exe] + args, cwd=cwd, input=stdin,
                          capture_output=True, timeout=600)
