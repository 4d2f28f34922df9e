"""Emit the sf0.1 -> sf1 per-query scaling table for SCALE.md.

Reads the official sf0.1 BENCH_DETAIL.json and the sf1 rehearsal's
BENCH_DETAIL_sf1.json (both produced by bench.py), computes wall-time
ratios, and prints a markdown table sorted by ratio descending. A query
scaling ~linearly in rows should show ratio <= ~10 plus fixed overhead;
with per-query fixed costs (session/JIT/stream machinery) of ~0.3-1s,
small absolute times make ratios noisy — the table therefore also prints
both absolute times so sub-second queries aren't misread as super-linear.

Usage: python tools/scale_report.py [sf0.1_detail] [sf1_detail]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    base_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_DETAIL.json"
    sf1_path = sys.argv[2] if len(sys.argv) > 2 else "BENCH_DETAIL_sf1.json"
    base = json.load(open(base_path))
    sf1 = json.load(open(sf1_path))
    b_q, s_q = base["queries"], sf1["queries"]
    b_rows, s_rows = base.get("rows", {}), sf1.get("rows", {})
    common = sorted(set(b_q) & set(s_q), key=lambda q: -s_q[q] / max(b_q[q], 1e-9))
    # rows-ratio column (r10 VERDICT #5): a super-linear TIME ratio whose
    # ROWS ratio moved the same way is output-volume-driven (e.g.
    # knn_range_search: planted clusters multiply matches), not a plan
    # regression — the table should show that distinction, not bury it
    print("| query | sf0.1 s | sf1 s | ratio | rows ratio |")
    print("|---|---|---|---|---|")
    for q in common:
        r = s_q[q] / max(b_q[q], 1e-9)
        if q in b_rows and q in s_rows and b_rows[q]:
            rr = f"{s_rows[q] / b_rows[q]:.1f}x"
        else:
            rr = "-"
        print(f"| {q} | {b_q[q]:.2f} | {s_q[q]:.2f} | {r:.1f}x | {rr} |")
    b_tot = sum(b_q[q] for q in common)
    s_tot = sum(s_q[q] for q in common)
    print(
        f"| **total ({len(common)} common)** | {b_tot:.1f} | {s_tot:.1f} "
        f"| {s_tot / b_tot:.1f}x | |"
    )
    for label, doc in (("sf0.1", base), ("sf1", sf1)):
        d = doc.get("derived", {})
        if d:
            print(
                f"\n{label} derived: insert {d.get('insert_vec_per_s')} vec/s, "
                f"query {d.get('query_per_s')} q/s"
            )
    only = set(b_q) ^ set(s_q)
    if only:
        print(f"\nnot in both runs: {sorted(only)}")
    errs = sf1.get("errors") or {}
    if errs:
        print(f"\nsf1 errors: {errs}")


if __name__ == "__main__":
    main()
