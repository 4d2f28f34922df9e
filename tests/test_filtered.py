"""Selectivity-adaptive filtered kNN: routing decision + branch agreement.

The router (operators/filtered.py) must pick pre_filter for selective
predicates and post_filter for weak ones, and BOTH branches must return the
exact filtered answer on data the index can search losslessly (small N,
high ef). Reference filtered-search parity: the reference's segment reader
threads a ts/tombstone predicate through graph traversal
(hnsw_table_reader.cc:1653-1738); the adaptive pre/post routing is the
Spark-native extension over attribute predicates.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vstream_spark.config import VectorIndexConf
from vstream_spark.operators.filtered import knn_filtered_adaptive
from vstream_spark.operators.knn import knn_exact

DIM = 8
N = 240
Q = 10
K = 5


@pytest.fixture(scope="module")
def dfs(spark):
    rng = np.random.RandomState(11)
    base = rng.rand(N, DIM).astype(np.float32)
    queries = rng.rand(Q, DIM).astype(np.float32)
    vdf = spark.createDataFrame(
        [(i, base[i].tolist(), i % 10) for i in range(N)],
        "id bigint, emb array<float>, label int",
    )
    qdf = spark.createDataFrame(
        [(i, queries[i].tolist()) for i in range(Q)], "qid bigint, emb array<float>"
    )
    return vdf, qdf


IC = VectorIndexConf(index_kind="hnsw", m=16, ef_construction=128, ef_search=128)


def _exact_filtered(vdf, qdf, pred):
    return knn_exact(vdf.filter(pred).select("id", "emb"), qdf, k=K, metric="l2")


def _canon(df):
    """(qid, neighbor_id, rank, round(distance, 9)) — the two branches sum
    the same float32 inputs in different orders (JVM fold vs numpy), so raw
    doubles differ in the last ulps while ids/ranks must be identical."""
    return df.select(
        "qid", "neighbor_id", "rank", F.round("distance", 9).alias("d")
    )


def _assert_same(df1, df2):
    a, b = _canon(df1), _canon(df2)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_selective_pred_routes_pre_filter_and_is_exact(dfs):
    vdf, qdf = dfs
    pred = F.col("label") == 3  # 10% selective
    out, strategy, sel = knn_filtered_adaptive(
        vdf, qdf, pred, k=K, metric="l2", index_conf=IC
    )
    assert strategy == "pre_filter"
    assert abs(sel - 0.1) < 1e-9
    exact = _exact_filtered(vdf, qdf, pred)
    _assert_same(out, exact)


def test_weak_pred_routes_post_filter_and_is_exact_here(dfs):
    vdf, qdf = dfs
    pred = F.col("label") % 2 == 0  # 50%
    out, strategy, sel = knn_filtered_adaptive(
        vdf, qdf, pred, k=K, metric="l2", index_conf=IC
    )
    assert strategy == "post_filter"
    assert abs(sel - 0.5) < 1e-9
    # N is tiny and ef covers the shard, so the oversampled post-filter is
    # exact here — any mismatch is a routing/re-rank bug, not index recall
    exact = _exact_filtered(vdf, qdf, pred)
    _assert_same(out, exact)


def test_forced_branches_agree(dfs):
    vdf, qdf = dfs
    pred = F.col("label") < 5
    pre, s1, _ = knn_filtered_adaptive(
        vdf, qdf, pred, k=K, index_conf=IC, force_strategy="pre_filter"
    )
    post, s2, _ = knn_filtered_adaptive(
        vdf, qdf, pred, k=K, index_conf=IC, force_strategy="post_filter"
    )
    assert (s1, s2) == ("pre_filter", "post_filter")
    _assert_same(pre, post)


def test_threshold_boundary_prefers_pre_filter(dfs):
    vdf, qdf = dfs
    pred = F.col("label") < 5  # exactly 0.5
    _, strategy, sel = knn_filtered_adaptive(
        vdf, qdf, pred, k=K, index_conf=IC, selectivity_threshold=0.5
    )
    # <= threshold stays on the exact branch (ties go to exactness)
    assert sel == 0.5 and strategy == "pre_filter"


def test_oversample_never_exceeds_corpus(dfs):
    vdf, qdf = dfs
    # selectivity ~0.9 with tiny k: k' = ceil(5*2/0.9) = 12 <= N; also check
    # the extreme — force post_filter on a 1-label predicate (sel=0.1,
    # k'=100 <= N) still returns only matching ids
    pred = F.col("label") == 7
    out, _, _ = knn_filtered_adaptive(
        vdf, qdf, pred, k=K, index_conf=IC, force_strategy="post_filter"
    )
    got = {r.neighbor_id for r in out.collect()}
    allowed = {r.id for r in vdf.filter(pred).select("id").collect()}
    assert got <= allowed


def test_force_strategy_validated(dfs):
    """A typo like 'prefilter' must raise, not silently run post_filter
    while reporting the bogus string as the strategy (ADVICE r11)."""
    vdf, qdf = dfs
    with pytest.raises(ValueError, match="force_strategy"):
        knn_filtered_adaptive(
            vdf, qdf, F.col("label") == 0, k=K, index_conf=IC,
            force_strategy="prefilter",
        )


def test_escalation_plan_has_no_literal_in_list(dfs):
    """The deficiency escalation is a broadcast anti/semi join against the
    deficient-qid frame, never a collect()+isin literal — an adversarial
    predicate (near-zero matches around every query) would otherwise bake a
    |Q|-entry In-expression into the plan (ADVICE r11). The escalating case
    below makes EVERY query deficient, so a literal list would be visible."""
    vdf, qdf = dfs
    out, _, _ = knn_filtered_adaptive(
        vdf, qdf, F.col("id") < 3, k=K, index_conf=IC,
        force_strategy="post_filter",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert " IN (" not in plan and " INSET " not in plan
    # the join-based escalation is actually in the plan
    assert "LeftAnti" in plan and "LeftSemi" in plan


def test_post_filter_escalates_when_matches_below_k(dfs):
    """Fewer matching vectors than k: every query is deficient in its
    oversampled top-k', so the per-query top-up must escalate to the exact
    branch and return ALL matches, exactly ranked — not a truncated or
    empty result."""
    vdf, qdf = dfs
    pred = F.col("id") < 3  # only 3 matching vectors, k=5
    out, _, _ = knn_filtered_adaptive(
        vdf, qdf, pred, k=K, index_conf=IC, force_strategy="post_filter"
    )
    exact = _exact_filtered(vdf, qdf, pred)
    _assert_same(out, exact)
    assert out.count() == Q * 3  # every query returns all three matches
