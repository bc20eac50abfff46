"""gzfastq_sort_list: identical contract to gzfastq_sort (the reference
implements the same sort via a linked list + qsort, reference
gzfastq_sort_list.c; list prepend + reversed array dump restores input
order, so ties behave identically). Flags differ only in lacking -r."""

from __future__ import annotations

from .gzfastq_sort import main as _sort_main


def main(argv: list[str]) -> int:
    return _sort_main([a for a in argv])
