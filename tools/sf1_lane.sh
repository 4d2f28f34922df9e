#!/bin/sh
# sf1 bench lane: a small named subset run at sf1 each round so the scaling
# exponent stays MEASURED, not argued, between full-suite sf1 rehearsals.
#
# The subset covers one representative per physical-plan family:
#   knn_partitioned_exact - LSH-routed partitioned kNN (the scale route for
#                          brute-force kNN; watch the k_cap/dedup-skip fixes)
#   knn_exact_l2         - the O(N*Q) brute-force floor (expected ~superlinear;
#                          kept as the known-bad reference point)
#   streaming_minhash_lsh_bounded - TTL-bounded streaming set-similarity
#                          (stateful shard scaling; binary-packed state)
#   dedup_minhash_lsh    - batch MinHash+LSH banding (bucketed propose/verify)
#   rel_salted_join      - skew-salted relational join
#   events_sessionize    - event-time windowed sessionization
#
# Usage: sh tools/sf1_lane.sh  [sf1_dir]    (default .localdata/sf1;
# generate with `python tools/gen_testdata.py 1.0 .localdata/sf1`).
# Writes BENCH_DETAIL_sf1_lane.json at the repo root (committed per round).
#
# Reporting convention (r9 VERDICT #6): prose cites the LATEST committed
# measurement from `queries` (or `remeasured.*.now` when the in-run
# re-measure is newer); `best_known` is a variance-reduction seed for the
# outlier gate, not a headline — when quoted, label it best-known.
set -e
SF1_DIR=${1:-.localdata/sf1}
cd "$(dirname "$0")/.."
[ -d "$SF1_DIR" ] || { echo "no $SF1_DIR - run: python tools/gen_testdata.py 1.0 $SF1_DIR" >&2; exit 1; }
SPARK_GRAFT_SF_DIR="$SF1_DIR" \
SPARK_GRAFT_BENCH_DETAIL="$(pwd)/BENCH_DETAIL_sf1_lane.json" \
SPARK_GRAFT_BENCH_SKIP_DERIVED=1 \
SPARK_GRAFT_BENCH_ONLY=knn_partitioned_exact,knn_exact_l2,streaming_minhash_lsh_bounded,dedup_minhash_lsh,rel_salted_join,events_sessionize \
python bench.py
