"""`ngstpu` CLI: one subcommand per reference tool, flag/default/output parity.

The reference ships ~15 independent binaries, each with hand-rolled getopt
parsing (pattern at reference fastq_count.c:166-202). We expose them as
subcommands of a single CLI; each subcommand module parses its own flags with
gnu_getopt to match C getopt permutation semantics and reproduces the
reference tool's exact output formats and default values.
"""

from __future__ import annotations

import importlib
import zlib
import sys

TOOLS = {
    "fastq_count": "ngstpu.tools.fastq_count",
    "fastq_count_kthread": "ngstpu.tools.fastq_count_kthread",
    "fastq_trim": "ngstpu.tools.fastq_trim",
    "pick_pair": "ngstpu.tools.pick_pair",
    "gzfastq_sample": "ngstpu.tools.gzfastq_sample",
    "gzfastq_uniq": "ngstpu.tools.gzfastq_uniq",
    "gzfastq_uniqQ": "ngstpu.tools.gzfastq_uniqQ",
    "gzfastq_uniq_sort": "ngstpu.tools.gzfastq_uniq_sort",
    "gzfastq_sort": "ngstpu.tools.gzfastq_sort",
    "gzfastq_sort_list": "ngstpu.tools.gzfastq_sort_list",
    "gzfastq_mrle": "ngstpu.tools.gzfastq_mrle",
    "fastq2twobit": "ngstpu.tools.fastq2twobit",
    "twoBit2seq": "ngstpu.tools.twobit2seq",
    "bam2depth": "ngstpu.tools.bam2depth",
    "bam2wig": "ngstpu.tools.bam2wig",
    "bam_sliding_count": "ngstpu.tools.bam_sliding_count",
    "bamSplitChr": "ngstpu.tools.bam_split_chr",
    "fastqc": "ngstpu.tools.fastqc",
    "pipeline": "ngstpu.tools.pipeline",
    "ordered_uniq": "ngstpu.tools.ordered_uniq",
    "index": "ngstpu.tools.bam_index",
}


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help", "help"):
        sys.stderr.write("usage: ngstpu <tool> [args...]\ntools:\n")
        for name in TOOLS:
            sys.stderr.write(f"  {name}\n")
        sys.stderr.write("  serve          (warm-process server; route "
                         "calls with NGSTPU_SERVER=<socket>)\n")
        return 1
    name = argv[0]
    if name == "serve":
        from .server import main as serve_main

        return serve_main(argv[1:])
    if name not in TOOLS:
        sys.stderr.write(f"ngstpu: unknown tool '{name}'\n")
        return 2
    import os

    server_sock = os.environ.get("NGSTPU_SERVER")
    if server_sock:
        from .server import call_server

        rc = call_server(server_sock, name, argv[1:])
        if rc is not None:
            return rc
        sys.stderr.write("ngstpu: server unreachable, running locally\n")
    from ..utils.jaxsetup import setup_jax_cache

    setup_jax_cache()
    mod = importlib.import_module(TOOLS[name])
    trace_dir = os.environ.get("NGSTPU_TRACE")
    try:
        if trace_dir:
            # structured device+host profiling (SURVEY.md §5: the upgrade
            # over the reference's stderr usec() checkpoints): capture a
            # jax.profiler trace viewable in TensorBoard/Perfetto
            import jax

            with jax.profiler.trace(trace_dir):
                return mod.main(argv[1:]) or 0
        return mod.main(argv[1:]) or 0
    except FileNotFoundError as e:
        sys.stderr.write(f"ngstpu {name}: {e}\n")
        return 1
    except (ValueError, EOFError, zlib.error) as e:
        # malformed input (bad FASTQ record structure, bad BAM/BGZF magic,
        # truncated gzip streams, codec domain errors) — fail cleanly like
        # a CLI, not a traceback
        sys.stderr.write(f"ngstpu {name}: invalid input: {e}\n")
        return 1
    except BrokenPipeError:
        return 0


if __name__ == "__main__":
    sys.exit(main())
