"""Arrange plans/r13 into the round deliverable layout: for every query
with a captured before/after formatted plan, write
plans/r13/<query>_before.txt and plans/r13/<query>_after.txt (copied from
the capture subdirs the profiler writes into)."""

from __future__ import annotations

import os
import shutil
import sys

BASE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans", "r13")


def main() -> None:
    names = sys.argv[1:]
    for name in names:
        for phase, suffix in (("before", "_before"), ("after", "_after")):
            src = os.path.join(BASE, phase, f"{name}.txt")
            if os.path.exists(src):
                shutil.copyfile(src, os.path.join(BASE, f"{name}{suffix}.txt"))
            else:
                print(f"missing {src}", file=sys.stderr)


if __name__ == "__main__":
    main()
