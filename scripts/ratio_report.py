#!/usr/bin/env python3
"""Per-query ratio report: Spark bench vs the DuckDB proxy.

Reads target/bench.json (graft.Bench full artifact) and a proxy JSON line
(scripts/scale_proxy.py output). Prints per-TPC-H-query default time, best
twin time (from the bench `pairs` table), and ratios vs the proxy, plus the
defaults-only and best-layout composites.

Usage: ratio_report.py <bench.json> <proxy.json>
"""
import json
import sys


def main():
    bench = json.load(open(sys.argv[1]))
    proxy = json.load(open(sys.argv[2]))
    # round-11 lesson: a drift-contaminated sweep (calibration 3.77 ->
    # 16.18 s) flowed into a committed ratio table; Bench now stamps
    # validity in the artifact and this report refuses invalid inputs.
    if bench.get("valid") is False:
        sys.exit("ERROR: bench artifact stamped invalid "
                 f"({bench.get('invalid_reason', 'no reason recorded')}); "
                 "re-run on a quiet box instead of reporting from it.")
    q = bench["queries"]
    pairs = bench.get("pairs", {})
    # twin times per default query
    twins = {}
    for twin, rec in pairs.items():
        d = rec["default_query"]
        twins.setdefault(d, []).append((twin, rec["twin"]))
    rows = []
    for name in sorted(proxy["queries"]):
        p = proxy["queries"][name]
        d = q.get(name, -1)
        if d <= 0:
            # Bench records -1 for a missing/failed query; letting it flow
            # into min() would silently shrink the composites.
            sys.exit(f"ERROR: default query {name!r} missing or failed in "
                     f"bench.json (recorded {d}); refusing to report.")
        tw = min(twins.get(name, []), key=lambda t: t[1], default=None)
        best = min([d] + ([tw[1]] if tw and tw[1] > 0 else []))
        rows.append((name, p, d, tw, best))
    print(f"{'query':10} {'proxy':>7} {'default':>8} {'d/p':>5} "
          f"{'best twin':>16} {'twin':>7} {'t/p':>5} {'best/p':>6}")
    for name, p, d, tw, best in rows:
        twname = tw[0] if tw else "-"
        twt = f"{tw[1]:7.2f}" if tw else "      -"
        twr = f"{tw[1]/p:5.2f}" if tw else "    -"
        print(f"{name:10} {p:7.3f} {d:8.2f} {d/p:5.2f} {twname:>16} "
              f"{twt} {twr} {best/p:6.2f}")
    tot_p = sum(p for _, p, _, _, _ in rows)
    tot_d = sum(d for _, _, d, _, _ in rows if d > 0)
    tot_b = sum(b for _, _, _, _, b in rows)
    over2 = sum(1 for _, p, _, _, b in rows if b / p > 2)
    print(f"\nproxy total {tot_p:.2f}s | defaults {tot_d:.2f}s "
          f"({tot_d/tot_p:.2f}x) | best-layout {tot_b:.2f}s "
          f"({tot_b/tot_p:.2f}x) | queries over 2x on best layout: {over2}/22")
    cal = bench.get("drift", {})
    print(f"drift: calibration={cal.get('calibration_sec')} "
          f"load={cal.get('loadavg_pre')} -> {cal.get('loadavg_post')} "
          f"steal={cal.get('steal_pct')}%")


if __name__ == "__main__":
    main()
