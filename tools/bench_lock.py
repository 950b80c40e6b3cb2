#!/usr/bin/env python3
"""Bench regression lock: compare a fresh BENCH_DETAIL.json against the
previous green one on the SHARED query set and fail loud when the warm
total drifts past the tolerance.

Usage: python3 tools/bench_lock.py NEW_DETAIL PREV_DETAIL [--tol 0.25]
         [--calib q_text_stats] [--per-query-tol 2.0]
         [--allow tools/bench_allow.json]

- An ALLOWLIST (--allow, default tools/bench_allow.json if present)
  waives NAMED per-query regressions/inversions: a JSON object of
  {query: reason}. A waived query prints WAIVED with its reason
  instead of failing — the attribution lives next to the lock, not in
  a side channel. The shared-total lock is NEVER waived (a page of
  allowances can't hide an aggregate regression), and stale entries
  are flagged: an allowlisted query that did NOT regress prints a
  "stale allow" warning so entries get retired the round after they
  land.

- Compares sum(warm) over queries present in BOTH files (mix shift from
  added/removed queries never trips the lock).
- NORMALIZES by a box factor: box drift moves every query by the same
  machine factor, so dividing the new times by that factor cancels
  drift — a real plan regression survives normalization, a slow box
  doesn't. The factor is the MEDIAN per-query warm ratio over shared
  queries above a 0.5 s noise floor (robust: a handful of real
  regressions can't move the median; a single calibration query's own
  plan change can't poison it — observed when q_text_stats moved 5.7x
  while the suite moved 2x). The named --calib query's ratio is
  printed as a cross-check; raw ratio is still enforced at 2*tol as a
  sanity backstop.
- Compares WARM-vs-WARM per query: any shared query whose normalized
  warm time regressed more than its EFFECTIVE tolerance (floor 0.5 s)
  is listed and fails the lock — a single-query regression can no
  longer hide inside a flat total.

- VARIANCE BANDS: when a detail carries `queries_warm_spread` (the
  max/min ratio over that query's own warm samples, recorded by
  graft.Bench), the per-query effective tolerance becomes
  max(--per-query-tol, min(--band-cap, band)) with band the BASELINE
  (prev) detail's recorded spread for that query — never the new
  detail's, which a fresh regression could inflate to waive itself
  (advice r16); a pre-instrument baseline falls back to the new
  detail's spreads with a printed warning. A query that
  measurably swings x2.8 on identical plans (the embedding family's
  box-state variance, attributed r15) no longer needs a prose
  allowlist entry — its own instrument-recorded noise widens its
  lock, while --band-cap (default 3.0) stops a runaway spread from
  waiving a real regression. The shared-total lock ignores bands.
- Checks the new detail for warm-over-cold inversions (warm > 1.5x
  cold AND warm - cold > 2 s): warm runs immediately after cold with
  caches resident, so a big inversion means the measurement itself is
  broken (GC pause, box contention) — re-measure rather than commit.
- Exit 1 on any failure, listing per-query offenders.
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
    ap.add_argument("--calib", default="q_text_stats")
    ap.add_argument("--per-query-tol", type=float, default=2.0)
    ap.add_argument("--band-cap", type=float, default=3.0,
                    help="upper bound on a variance-band-widened "
                         "per-query tolerance")
    ap.add_argument("--allow", default=None,
                    help="JSON {query: reason} waiving named per-query "
                         "regressions/inversions (default: "
                         "tools/bench_allow.json when it exists)")
    a = ap.parse_args()
    import os
    allow_path = a.allow
    if allow_path is None:
        cand = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_allow.json")
        allow_path = cand if os.path.exists(cand) else None
    allow = {}
    if allow_path:
        with open(allow_path) as f:
            allow = json.load(f)
        print(f"allowlist: {len(allow)} entries from {allow_path}")
    waived = set()
    new, prev = load(a.new_detail), load(a.prev_detail)
    key = "queries_warm" if "queries_warm" in new and "queries_warm" in prev \
        else "queries"
    nw, pw = new[key], prev[key]
    shared = sorted(set(nw) & set(pw))
    if not shared:
        raise SystemExit("no shared queries between the two details")
    failed = False

    # -- box factor (drift estimate): median per-query ratio ---------
    ratios = sorted(nw[q] / pw[q] for q in shared if pw[q] >= 0.5)
    if ratios:
        calib = ratios[len(ratios) // 2]
        print(f"box factor (median of {len(ratios)} per-query ratios "
              f">=0.5s): {calib:.3f}")
    else:
        calib = 1.0
        print("no shared queries above the 0.5s floor; raw comparison")
    if a.calib in nw and a.calib in pw and pw[a.calib] > 0:
        print(f"  cross-check {a.calib}: {pw[a.calib]:.2f} -> "
              f"{nw[a.calib]:.2f}s (x{nw[a.calib] / pw[a.calib]:.3f})")

    # -- shared-total lock (normalized + raw backstop) ---------------
    tn, tp = sum(nw[q] for q in shared), sum(pw[q] for q in shared)
    raw = tn / tp if tp else float("inf")
    norm = raw / calib
    print(f"shared={len(shared)} ({key}) new={tn:.1f}s prev={tp:.1f}s "
          f"raw={raw:.3f} normalized={norm:.3f} tol=±{a.tol:.0%}")
    deltas = sorted(((nw[q] - pw[q], q) for q in shared), reverse=True)
    for d, q in deltas[:8]:
        if abs(d) > 0.25:
            print(f"  {q}: {pw[q]:.2f} -> {nw[q]:.2f}  ({d:+.2f}s)")
    if norm > 1 + a.tol:
        print(f"FAIL: shared warm total regressed {norm - 1:+.0%} "
              f"normalized (> {a.tol:.0%}); offenders above")
        failed = True
    elif raw > 1 + 2 * a.tol:
        print(f"FAIL: raw ratio {raw:.2f} exceeds sanity backstop "
              f"{1 + 2 * a.tol:.2f} — calibration factor {calib:.2f} "
              f"is hiding too much; re-measure on a quiet box")
        failed = True

    # -- per-query warm-vs-warm lock ----------------------------------
    # effective tolerance per query: the base tol, widened to the
    # query's own instrument-recorded variance band (capped)
    # The band comes from the BASELINE (prev) detail's recorded spread
    # only: a code change that makes a query intermittently slower
    # would inflate its own new-detail spread and thereby widen the
    # very lock meant to catch it (advice r16 — the max(prev, new)
    # version was self-waiving). A pre-instrument baseline (no
    # queries_warm_spread key at all) falls back to the new detail's
    # spreads — the only variance data that exists for that pair —
    # and says so.
    spread_new = new.get("queries_warm_spread", {})
    spread_prev = prev.get("queries_warm_spread")
    if spread_prev is None and spread_new:
        print("note: baseline detail records no variance bands; "
              "falling back to the NEW detail's (weaker: a regression "
              "can widen its own band)")
    spread = spread_prev if spread_prev is not None else spread_new

    def tol_for(q):
        band = spread.get(q, 1.0)
        return max(a.per_query_tol, min(a.band_cap, band))

    per_bad = []
    for q in shared:
        if pw[q] < 0.5 and nw[q] < 0.5:
            continue  # noise floor
        r = (nw[q] / calib) / pw[q] if pw[q] > 0 else float("inf")
        if r > tol_for(q) and nw[q] / calib - pw[q] > 0.5:
            per_bad.append((r, q))
        elif r > a.per_query_tol and nw[q] / calib - pw[q] > 0.5:
            print(f"BAND per-query: {q} {pw[q]:.2f} -> {nw[q]:.2f}s "
                  f"(normalized x{r:.2f}) within its measured band "
                  f"x{tol_for(q):.2f}")
    for r, q in sorted(per_bad, reverse=True):
        if q in allow:
            waived.add(q)
            print(f"WAIVED per-query: {q} {pw[q]:.2f} -> {nw[q]:.2f}s "
                  f"(normalized x{r:.2f}) — {allow[q]}")
        else:
            print(f"FAIL per-query: {q} {pw[q]:.2f} -> {nw[q]:.2f}s "
                  f"(normalized x{r:.2f} > x{tol_for(q):.1f})")
            failed = True

    # -- warm-over-cold inversion check on the NEW detail -------------
    nc = new.get("queries")
    if nc and key == "queries_warm":
        for q in sorted(nw):
            c, w = nc.get(q), nw[q]
            if c and w > 1.5 * c and w - c > 2.0:
                if q in allow:
                    waived.add(q)
                    print(f"WAIVED inversion: {q} warm {w:.2f}s > 1.5x "
                          f"cold {c:.2f}s — {allow[q]}")
                else:
                    print(f"FAIL inversion: {q} warm {w:.2f}s > 1.5x cold "
                          f"{c:.2f}s — measurement is broken, re-run")
                    failed = True

    for q in sorted(set(allow) - waived):
        print(f"stale allow: {q} did not trip this run — retire its entry")

    if failed:
        sys.exit(1)
    print("PASS" + (f" ({len(waived)} waived)" if waived else ""))


if __name__ == "__main__":
    main()
