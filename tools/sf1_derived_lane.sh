#!/bin/sh
# sf1 derived-axis lane: measures ONLY the two BASELINE.md throughput axes
# (insert vec/s into the segment store; query/s through the LSH-partitioned
# ANN dataflow) at sf1, without re-running the 122-query suite.
#
# Why a separate lane: the full-suite sf1 run takes an hour-plus before the
# derived phase even starts (r9's run was stopped there and the axes never
# got measured — VERDICT r9 missing #1). bench.py has no derived-only mode;
# the lane gets one by restricting the query list to the cheapest registered
# query (table_profile, ~0.5s — its timing is discarded, the lane exists
# for the `derived` block).
#
# Reporting convention (r9 VERDICT #6): prose quotes the LATEST committed
# measurement; `derived_best_known` (max-merged across runs) is shown
# separately when cited at all.
#
# Usage: sh tools/sf1_derived_lane.sh [sf1_dir]   (default .localdata/sf1)
# Writes BENCH_DETAIL_sf1_derived.json at the repo root (committed).
set -e
SF1_DIR=${1:-.localdata/sf1}
cd "$(dirname "$0")/.."
[ -d "$SF1_DIR" ] || { echo "no $SF1_DIR - run: python tools/gen_testdata.py 1.0 $SF1_DIR" >&2; exit 1; }
SPARK_GRAFT_SF_DIR="$SF1_DIR" \
SPARK_GRAFT_BENCH_DETAIL="$(pwd)/BENCH_DETAIL_sf1_derived.json" \
SPARK_GRAFT_BENCH_ONLY=table_profile \
python bench.py
