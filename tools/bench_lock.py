#!/usr/bin/env python3
"""Bench regression lock: compare a fresh BENCH_DETAIL.json against the
previous green one on the SHARED query set and fail loud when the warm
total drifts past the tolerance.

Usage: python3 tools/bench_lock.py NEW_DETAIL PREV_DETAIL [--tol 0.25]

- Compares sum(warm) over queries present in BOTH files (mix shift from
  added/removed queries never trips the lock).
- Exit 1 if the shared warm total moved more than --tol (default 25%),
  listing the per-query offenders (worst absolute regressions first).
- Per-query times are noisy (±10%, worse with a lingering JVM — see
  NOTES); the lock is on the shared TOTAL, offenders are diagnostics.
"""
import argparse
import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            d = json.loads(line)
            if d.get("metric") == "bench_detail":
                return d
    raise SystemExit(f"no bench_detail line in {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("new_detail")
    ap.add_argument("prev_detail")
    ap.add_argument("--tol", type=float, default=0.25)
    a = ap.parse_args()
    new, prev = load(a.new_detail), load(a.prev_detail)
    key = "queries_warm" if "queries_warm" in new and "queries_warm" in prev \
        else "queries"
    nw, pw = new[key], prev[key]
    shared = sorted(set(nw) & set(pw))
    if not shared:
        raise SystemExit("no shared queries between the two details")
    tn, tp = sum(nw[q] for q in shared), sum(pw[q] for q in shared)
    ratio = tn / tp if tp else float("inf")
    print(f"shared={len(shared)} ({key}) new={tn:.1f}s prev={tp:.1f}s "
          f"ratio={ratio:.3f} tol=±{a.tol:.0%}")
    deltas = sorted(((nw[q] - pw[q], q) for q in shared), reverse=True)
    for d, q in deltas[:8]:
        if abs(d) > 0.25:
            print(f"  {q}: {pw[q]:.2f} -> {nw[q]:.2f}  ({d:+.2f}s)")
    if ratio > 1 + a.tol:
        print(f"FAIL: shared warm total regressed {ratio - 1:+.0%} "
              f"(> {a.tol:.0%}); offenders above")
        sys.exit(1)
    print("PASS")


if __name__ == "__main__":
    main()
