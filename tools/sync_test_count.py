#!/usr/bin/env python3
"""Derive the ScalaTest count in README.md / SURVEY.md from a captured
suite-run artifact instead of hand-syncing (VERDICT r10 housekeeping #2:
two straight rounds of count-drift commits).

Usage:
    tools/sync_test_count.py <suite-log>

<suite-log> is a file containing the tail of an `sbt test` run (e.g.
`tmux capture-pane -t sbt -p > dev/TEST_RUN_rN.txt`). The script
extracts the LAST "Tests: succeeded N, failed 0" line, refuses to sync
from a run with failures, and rewrites every "NNN ScalaTest specs"
occurrence in README.md and SURVEY.md to the extracted count. Exits
nonzero (changing nothing) if the log has no such line or any failure.
"""
import re
import sys
import pathlib

def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    log = pathlib.Path(sys.argv[1]).read_text(errors="replace")
    runs = re.findall(r"Tests: succeeded (\d+), failed (\d+)", log)
    if not runs:
        print("no 'Tests: succeeded N, failed M' line found — not syncing")
        return 1
    n, failed = (int(x) for x in runs[-1])
    if failed:
        print(f"suite run has {failed} failures — not syncing")
        return 1
    repo = pathlib.Path(__file__).resolve().parent.parent
    for name in ("README.md", "SURVEY.md"):
        p = repo / name
        old = p.read_text()
        # Only the LAST occurrence is the live count — earlier ones sit
        # in per-round SURVEY addenda, which are historical records of
        # what was green at that round's close and must not be rewritten
        # (an all-occurrence sub falsified the r9/r10 closing counts).
        matches = list(re.finditer(r"\d+ ScalaTest specs", old))
        if matches:
            m = matches[-1]
            new = old[:m.start()] + f"{n} ScalaTest specs" + old[m.end():]
            if new != old:
                p.write_text(new)
        print(f"{name}: {'1 (last of %d)' % len(matches) if matches else '0'}"
              f" occurrence(s) -> {n}")
    return 0

if __name__ == "__main__":
    sys.exit(main())
