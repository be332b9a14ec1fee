#!/usr/bin/env python3
"""Scale-regression gate on the committed sf0.1->sf1 ratio table.

Round 7's lesson: ScaleProbe's synthetic 8x ceiling passed the
`matching_scan` shape while the same plan blew 24x at sf1 — wall-clock
at a real 10x corpus catches what bounded probes miss. So the per-query
sf1 ratio table is itself a committed regression input: re-run at each
round's close and diff against the previous round's committed table;
any query whose ratio NEWLY exceeds the ceiling is a gate failure (exit
1, loud), as is a >=1.5x worsening of an already-over-ceiling row.
Known over-ceiling rows carried in the baseline are reported but don't
fail — they are adjudicated in tools/adjudications.json (data-inherent
growth vs plan defect; the gate prints each row's committed rationale),
and ratcheting them DOWN updates the baseline.

When both sf1 inputs are bench_pair artifacts carrying the guarded
runner's `result_rows`, the gate also prints OUTPUT growth next to time
growth for every over-ceiling row (old/new result rows where the small
side's are known), so a new over-ceiling row arrives with its
output-cardinality denominator attached instead of requiring manual
archaeology (the q204/q160 adjudications of round 8).

Usage:
  python3 tools/scale_gate.py <baseline_pair_or_detail.json>
                              <new_pair_or_detail.json>
                              <small_side.json> [factor=10] [floor=0.15]
                              [adjudications=tools/adjudications.json]

The two sf1 inputs are compared against the SAME small-side (sf0.1)
map so the gate measures sf1 drift, not sf0.1 noise. Sub-`floor`
small-side rows are scheduling noise and never gate.
"""
import sys, os, json

from scale_ratio import qmap


def ratios(small, big, floor):
    out = {}
    for n in set(small) & set(big):
        if small[n] >= floor:
            out[n] = big[n] / max(small[n], 1e-9)
    return out


def result_rows(path):
    try:
        return json.load(open(path)).get("duckdb", {}).get(
            "result_rows", {})
    except Exception:
        return {}


def main():
    base_p, new_p, small_p = sys.argv[1], sys.argv[2], sys.argv[3]
    factor = float(sys.argv[4]) if len(sys.argv) > 4 else 10.0
    floor = float(sys.argv[5]) if len(sys.argv) > 5 else 0.15
    adj_p = sys.argv[6] if len(sys.argv) > 6 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "adjudications.json")
    ceiling = factor * 1.2
    small = qmap(small_p)
    base = ratios(small, qmap(base_p), floor)
    new = ratios(small, qmap(new_p), floor)
    adj = {}
    if os.path.exists(adj_p):
        adj = json.load(open(adj_p)).get("sf1_over_ceiling", {})
    rr_small = result_rows(small_p)
    rr_new = result_rows(new_p)

    def outgrow(n):
        if n in rr_small and n in rr_new and rr_small[n] > 0:
            return (f" [output {rr_small[n]}->{rr_new[n]} rows = "
                    f"{rr_new[n] / rr_small[n]:.1f}x]")
        return ""

    known = {n for n, r in base.items() if r > ceiling}
    fresh = sorted(n for n, r in new.items()
                   if r > ceiling and n not in known)
    worse = sorted(n for n in known
                   if n in new and new[n] > ceiling
                   and new[n] >= 1.5 * base[n])
    fixed = sorted(n for n in known if n in new and new[n] <= ceiling)

    print(f"[scale-gate] ceiling {ceiling:.1f}x over {len(new)} material "
          f"queries (floor {floor}s at the small side)")
    for n in sorted(known):
        cur = f"{new[n]:.1f}x" if n in new else "absent"
        why = adj.get(n)
        print(f"[scale-gate] known over-ceiling: {n} "
              f"baseline {base[n]:.1f}x -> {cur}{outgrow(n)}"
              + (f"\n[scale-gate]   adjudicated: {why}" if why else
                 "\n[scale-gate]   WARNING: no committed adjudication "
                 f"in {adj_p}"))
    if fixed:
        print(f"[scale-gate] ratcheted under ceiling (update baseline): "
              f"{', '.join(fixed)}")
    if fresh:
        for n in fresh:
            print(f"[scale-gate] FAIL new over-ceiling row: {n} "
                  f"{new[n]:.1f}x (baseline "
                  f"{base.get(n, float('nan')):.1f}x){outgrow(n)}")
    if worse:
        for n in worse:
            print(f"[scale-gate] FAIL known row worsened >=1.5x: {n} "
                  f"{base[n]:.1f}x -> {new[n]:.1f}x{outgrow(n)}")
    if fresh or worse:
        raise SystemExit(1)
    print("[scale-gate] PASS")


if __name__ == "__main__":
    main()
