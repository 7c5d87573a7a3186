"""Compare two bench JSON artifacts: per-query steady-state deltas,
common-query totals, and regressions beyond a threshold.

Usage: python tools/compare_bench.py BENCH_old.json BENCH_new.json [pct]
Exit 1 if any common query regressed more than ``pct`` (default 15%,
the judge's bar since r8)
AND more than 0.15 s absolute — small absolute jitter is not a
regression signal on a shared machine.

When BOTH artifacts carry ``calibration_sec`` (the fixed synthetic
spark.range workload bench.py times each run), the new times are
additionally shown NORMALIZED for host-speed difference —
``n * (cal_old / cal_new)`` — and the regression verdict uses the
normalized delta, so a slower shared host doesn't read as a query
regression (and a faster one doesn't mask it).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    old_path, new_path = sys.argv[1], sys.argv[2]
    pct = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
    def load(path):
        d = json.load(open(path))
        # driver-recorded BENCH_r*.json wraps bench.py's line in "parsed"
        return d.get("parsed") or d

    old, new = load(old_path), load(new_path)
    qo, qn = old.get("queries") or {}, new.get("queries") or {}
    if not (set(qo) & set(qn)):
        print("no common queries between the two artifacts")
        sys.exit(0)
    common = sorted(set(qo) & set(qn))
    print(f"common queries: {len(common)}  (old-only: {sorted(set(qo)-set(qn))}, "
          f"new-only: {sorted(set(qn)-set(qo))})")
    cal_o, cal_n = old.get("calibration_sec"), new.get("calibration_sec")
    scale = 1.0
    if cal_o and cal_n:
        scale = cal_o / cal_n
        print(f"calibration: old {cal_o:.3f}s, new {cal_n:.3f}s -> "
              f"normalizing new times by x{scale:.3f} (host-speed correction)")
    else:
        print("calibration: missing on one side -> raw comparison only")
    tot_o = sum(qo[q] for q in common)
    tot_n = sum(qn[q] for q in common)
    print(f"common total: {tot_o:.2f}s -> {tot_n:.2f}s raw ({tot_n/tot_o:.2f}x), "
          f"{tot_n*scale:.2f}s normalized ({tot_n*scale/tot_o:.2f}x)")
    regressions = []
    variance_outliers = []
    # a per-query new/old ratio far beyond the host-speed ratio is a
    # HOST-VARIANCE signature, not a plan regression: the calibration
    # workload is CPU-only, so IO/shuffle pressure on a shared box hits
    # individual queries harder than it hits the calibration.  Flag
    # mechanically (r8: corr_matrix ran 2.86x driver/local against a
    # 1.86x calibration ratio and had to be spotted by hand).
    host_ratio = (cal_n / cal_o) if (cal_o and cal_n) else 1.0
    for q in common:
        o, n = qo[q], qn[q]
        adj = n * scale
        delta = (n - o) / o * 100 if o else 0.0
        delta_adj = (adj - o) / o * 100 if o else 0.0
        flag = ""
        if adj - o > 0.15 and delta_adj > pct:
            regressions.append(q)
            flag = "  <-- REGRESSION"
        if o and n - o > 0.15 and (n / o) > 1.5 * host_ratio:
            variance_outliers.append(q)
            flag += "  [host-variance outlier]"
        norm = f"  (norm {adj:7.3f}s {delta_adj:+6.1f}%)" if scale != 1.0 else ""
        print(f"  {q:28s} {o:7.3f}s -> {n:7.3f}s  {delta:+6.1f}%{norm}{flag}")
    if variance_outliers:
        print(f"WARNING host-variance outliers (ratio > 1.5x the {host_ratio:.2f}x "
              f"calibration ratio): {variance_outliers} — adjudicate with a "
              "same-host re-run before treating these as regressions")
    if regressions:
        print(f"REGRESSED (> {pct}% and > 0.15s): {regressions}")
        sys.exit(1)
    print("no significant regressions")


if __name__ == "__main__":
    main()
