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
testOnly invocation is present, and rewrites the "NNN ScalaTest
specs" count ONLY on lines carrying the <!--live-test-count--> marker
in README.md and SURVEY.md (historical per-round counts are never
touched). Exits nonzero (changing nothing) on any of those log-level
refusals; a file with no marker line is skipped loudly and the exit
is ALSO nonzero — even when the other file synced — so automation can
never mistake a skipped file for a synced count (ADVICE r18).
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
    refused = False
    for name in ("README.md", "SURVEY.md"):
        p = repo / name
        old = p.read_text()
        # ONLY lines carrying the explicit <!--live-test-count--> marker
        # are rewritten. The previous "last occurrence is the live
        # count" heuristic silently falsified per-round SURVEY addenda
        # TWICE (the r17 closing paragraph in r18's first sync, then
        # the r15 close once r17's was reworded out of the pattern) —
        # historical records of what was green at a round's close must
        # never be position-inferred. No marker line => refuse loudly.
        lines = old.split("\n")
        hits = [i for i, ln in enumerate(lines)
                if "<!--live-test-count-->" in ln
                and re.search(r"\d+ ScalaTest specs", ln)]
        if not hits:
            # a refusal must be VISIBLE in the exit code, not only on
            # stdout: automation invoking the tool cannot otherwise
            # distinguish a synced count from a skipped file, and a
            # stale count would pass silently (ADVICE r18)
            print(f"{name}: NO <!--live-test-count--> marker line with an "
                  "'NNN ScalaTest specs' count — not syncing this file "
                  "(add the marker to the living count line)")
            refused = True
            continue
        for i in hits:
            lines[i] = re.sub(r"\d+ ScalaTest specs",
                              f"{n} ScalaTest specs", lines[i])
        new_text = "\n".join(lines)
        if new_text != old:
            p.write_text(new_text)
        print(f"{name}: {len(hits)} marked line(s) -> {n}")
    return 1 if refused else 0

if __name__ == "__main__":
    sys.exit(main())
