"""Reconstruct a BENCH_DETAIL json from a bench.py stderr log.

bench.py writes its detail JSON only at the very end of the run; if the
process has to be stopped mid-way through the (long) derived-axis phase,
hours of per-query measurement would otherwise be lost. This parser
re-creates the detail document from the `# name: N rows in Xs (best of R)`
lines the run already printed. Derived axes are recorded as absent (the
run was stopped before they completed) — that is stated in `errors` so
the artifact is honest about what was and wasn't measured.

Usage: python tools/salvage_bench_log.py <log> <out.json> <sf>
"""

from __future__ import annotations

import json
import re
import sys


def main() -> None:
    log_path, out_path, sf = sys.argv[1], sys.argv[2], float(sys.argv[3])
    pat = re.compile(
        r"# ([a-z0-9_]+): (\d+) rows in ([0-9.]+)s \(best of (\d+)\)"
    )
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    repeats = 3
    with open(log_path, errors="replace") as f:
        for line in f:
            for m in pat.finditer(line):
                name, n, t, r = m.groups()
                # later lines win (outlier re-measures would reprint; they
                # don't, but keep min anyway for safety)
                t = float(t)
                timings[name] = min(t, timings.get(name, t))
                rows[name] = int(n)
                repeats = int(r)
    # merge any prior best_known from an existing file at the same sf
    best_known = dict(timings)
    try:
        with open(out_path) as f:
            prev = json.load(f)
        if str(prev.get("sf")) == str(sf):
            for q, t in {**prev.get("queries", {}), **prev.get("best_known", {})}.items():
                best_known[q] = min(best_known.get(q, t), t)
    except (OSError, ValueError):
        pass
    detail = {
        "metric": "declared_query_suite_seconds",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "repeats": repeats,
        "restart_every": 20,
        "derived": {},
        "derived_best_known": {},
        "derived_remeasured": {},
        "errors": {
            "derived": "run stopped during the derived-axis phase; "
            "per-query timings salvaged from the run log"
        },
        "remeasured": {},
        "queries": dict(sorted(timings.items())),
        "rows": dict(sorted(rows.items())),
        "best_known": dict(sorted(best_known.items())),
    }
    with open(out_path, "w") as f:
        json.dump(detail, f, indent=1)
        f.write("\n")
    print(f"salvaged {len(timings)} query timings -> {out_path}")


if __name__ == "__main__":
    main()
