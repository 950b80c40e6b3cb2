#!/usr/bin/env python3
"""Suite wall-time lock: fail loud when `sbt test` drifts past budget.

Usage: sbt -batch test 2>&1 | tee /tmp/suite.log
       python3 tools/suite_lock.py /tmp/suite.log

Parses scalatest's "Run completed in ..." line(s) (summing across
forked runs if several) and compares the total against the budget in
tools/suite_budget.json ({"max_seconds": N, "set_at": "...", "note":
"..."}). The budget is a RATCHET against silent doubling, not a perf
target: when the suite legitimately grows (new specs), raise the
budget IN THE SAME COMMIT with a note — an unexplained bump is
exactly what this lock exists to catch. Exit 1 over budget.
"""
import json
import os
import re
import sys


def parse_seconds(text):
    total = 0.0
    pat = re.compile(
        r"Run completed in (?:(\d+) hours?, )?(?:(\d+) minutes?, )?"
        r"(\d+(?:\.\d+)?)? ?(seconds?|milliseconds?)?")
    for m in re.finditer(r"Run completed in [^.\n]*", text):
        s = m.group(0)
        h = re.search(r"(\d+) hour", s)
        mn = re.search(r"(\d+) minute", s)
        sec = re.search(r"(\d+) second", s)
        ms = re.search(r"(\d+) millisecond", s)
        total += (int(h.group(1)) * 3600 if h else 0) \
            + (int(mn.group(1)) * 60 if mn else 0) \
            + (int(sec.group(1)) if sec else 0) \
            + (int(ms.group(1)) / 1000.0 if ms else 0)
    return total


def main():
    if len(sys.argv) != 2:
        raise SystemExit(__doc__)
    with open(sys.argv[1]) as f:
        text = f.read()
    secs = parse_seconds(text)
    if secs == 0:
        raise SystemExit("no 'Run completed in' line found — did the "
                         "suite run (and finish)?")
    budget_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "suite_budget.json")
    with open(budget_path) as f:
        budget = json.load(f)
    limit = budget["max_seconds"]
    print(f"suite wall time: {secs:.0f}s, budget {limit}s "
          f"({budget.get('note', '')})")
    if secs > limit:
        print(f"FAIL: suite exceeded its wall-time budget by "
              f"{secs - limit:.0f}s — find the slow new spec or raise "
              f"the budget WITH a note in the same commit")
        sys.exit(1)
    print("PASS")


if __name__ == "__main__":
    main()
