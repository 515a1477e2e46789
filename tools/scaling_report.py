#!/usr/bin/env python3
"""Render the sf0.1 -> sf1.0 scaling table for BASELINE.md.

Usage: scaling_report.py <bench_sf01.json> <bench_sf1.json>

Prints a markdown table of per-query times and the observed ratio
(10x data => ratio ~10 is linear scaling; anything well above is
flagged). Entries below a floor at BOTH scales are summarized, not
listed — their times are harness floors, not data costs.
"""
import json
import sys

FLOOR = 0.35  # seconds: below this at both scales, the time is harness


def main(p01: str, p1: str) -> None:
    b01 = json.load(open(p01))["queries"]
    b1 = json.load(open(p1))["queries"]
    common = sorted(set(b01) & set(b1))
    rows, floored = [], []
    for q in common:
        t0, t1 = b01[q], b1[q]
        if t0 < 0 or t1 < 0:
            rows.append((q, t0, t1, None, "FAILED"))
            continue
        if t0 < FLOOR and t1 < FLOOR:
            floored.append(q)
            continue
        ratio = t1 / max(t0, 1e-9)
        flag = ""
        if ratio > 15:
            flag = "superlinear"
        elif ratio <= 11:
            flag = "<= linear"
        else:
            flag = "~linear+"
        rows.append((q, t0, t1, ratio, flag))
    rows.sort(key=lambda r: -(r[3] or 999))
    print("| query | sf0.1 s | sf1.0 s | ratio (10x data) | verdict |")
    print("|---|---|---|---|---|")
    for q, t0, t1, ratio, flag in rows:
        r = f"{ratio:.1f}x" if ratio is not None else "-"
        print(f"| {q} | {t0:.2f} | {t1:.2f} | {r} | {flag} |")
    print()
    print(f"{len(floored)} entries under {FLOOR}s at BOTH scales "
          "(harness floor, not data cost): " + ", ".join(floored))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
