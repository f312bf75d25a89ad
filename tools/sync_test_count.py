#!/usr/bin/env python3
"""Derive the ScalaTest count in README.md / SURVEY.md from a captured
suite-run artifact instead of hand-syncing (VERDICT r10 housekeeping #2:
two straight rounds of count-drift commits).

Usage:
    tools/sync_test_count.py <suite-log>

<suite-log> is a file containing the tail of an `sbt test` run (e.g.
`tmux capture-pane -t sbt -p > dev/TEST_RUN_rN.txt`). The script
requires every "Tests: succeeded N, failed 0" summary in the log to
agree on ONE count (multiple distinct green counts are ambiguous —
capture a single full run), refuses to sync if ANY run summary has
failures, any suite aborted, a TESTS FAILED banner appears, or a
testOnly invocation is present, and rewrites the LAST "NNN ScalaTest
specs" occurrence in README.md and SURVEY.md to that count. Exits
nonzero (changing nothing) on any of those refusals.
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
    # ANY failing summary poisons the log, not just the last one: sbt
    # multi-module runs (and a capture spanning several runs) emit one
    # summary per run, and a later green re-run must not launder an
    # earlier red one into the synced count (ADVICE r11 #4).
    bad = [int(f) for _, f in runs if int(f)]
    if bad:
        print(f"suite log contains failing run(s) ({bad}) — not syncing")
        return 1
    # Aborted suites are reported SEPARATELY from failed tests (their
    # tests never ran, so 'failed 0' can coexist with aborted suites
    # and a silently-low succeeded count), as is the banner sbt prints
    # on a red run.
    aborted = [int(a) for a in re.findall(r"Suites: completed \d+, aborted (\d+)", log)]
    if any(aborted):
        print(f"suite log contains aborted suite(s) ({[a for a in aborted if a]}) — not syncing")
        return 1
    if re.search(r"\*\*\* \d+ TESTS? FAILED \*\*\*", log):
        print("suite log contains a TESTS FAILED banner — not syncing")
        return 1
    # A capture that ran `testOnly` contains a green-but-PARTIAL summary
    # whose count is not the suite's; refuse rather than guess which
    # summary is the full run.
    if re.search(r"\btestOnly\b", log):
        print("suite log contains a testOnly invocation — capture a full"
              " `sbt test` run instead; not syncing")
        return 1
    # Multiple distinct green counts in one capture are ambiguous BOTH
    # ways: picking max() can sync a STALE higher count when a round
    # legitimately removes/renames specs (the old full run is larger),
    # and picking the last can launder a subset run. Refuse and ask for
    # a clean single-run capture instead of guessing (ADVICE r12 #1).
    counts = sorted({int(s) for s, _ in runs})
    if len(counts) > 1:
        print(f"suite log contains multiple distinct green counts {counts} — "
              "capture a single full `sbt test` run instead; not syncing")
        return 1
    n = counts[0]
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
