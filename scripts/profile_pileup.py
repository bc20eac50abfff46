#!/usr/bin/env python
"""Per-stage profile of the pileup pipeline over the bench fixtures.

Thin CLI over ngstpu.testing.pileup_profile (the module bench_pileup.py
embeds into its JSON artifact). Usage:

    python scripts/profile_pileup.py [wgs|small|both|<path.bam>]
"""
from __future__ import annotations

import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from ngstpu.testing.pileup_profile import profile_stages  # noqa: E402

FIXTURES = {
    "wgs": REPO / ".cache/bench/pileup_8388608_24x100000000.bam",
    "small": REPO / ".cache/bench/pileup_1048576.bam",
}


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    paths = ([FIXTURES["wgs"], FIXTURES["small"]] if which == "both"
             else [FIXTURES.get(which, pathlib.Path(which))])
    for p in paths:
        print(json.dumps(profile_stages(str(p)), indent=1, default=float))


if __name__ == "__main__":
    main()
