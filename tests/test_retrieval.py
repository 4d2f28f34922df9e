"""BM25 / RRF / weighted-sampling parity and determinism tests."""

import math

from pyspark.sql import functions as F

from vstream_spark.operators.retrieval import bm25, rrf_fuse
from vstream_spark.operators.sample import weighted_sample


def _ref_bm25(docs, terms, k1=1.2, b=0.75):
    """Pure-Python Okapi BM25 (Lucene idf variant) over whitespace tokens."""
    toks = {d: t.split() for d, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    out = {}
    df = {
        t: sum(1 for v in toks.values() if t in v)
        for t in terms
    }
    for d, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * len(v) / avgdl))
        if s > 0:
            out[d] = round(s, 6)
    return out


def test_bm25_matches_reference(spark):
    docs = [
        (0, "spark vector search engine"),
        (1, "vector vector stream search"),
        (2, "engine room no match here"),
        (3, "search and search and search"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.score for r in bm25(df, ["vector", "search"]).collect()}
    want = _ref_bm25(docs, ["vector", "search"])
    assert got == want
    # doc 2 matches no term -> absent
    assert 2 not in got


def test_rrf_fuse_is_rank_arithmetic(spark):
    r1 = spark.createDataFrame([(1, 1), (2, 2)], "doc_id long, rank int")
    r2 = spark.createDataFrame([(2, 1), (3, 2)], "doc_id long, rank int")
    got = {r.doc_id: r.rrf_score for r in rrf_fuse([r1, r2]).collect()}
    assert got[1] == 1.0 / 61
    assert got[2] == 1.0 / 62 + 1.0 / 61
    assert got[3] == 1.0 / 62
    # overlap doc ranks highest
    assert max(got, key=got.get) == 2


def test_weighted_sample_stable_and_weighted(spark):
    rows = [(i, 1 if i < 90 else 1000) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    top = weighted_sample(df, 10, "w")
    ids1 = sorted(r.doc_id for r in top.collect())
    # identical winners under a different partitioning (determinism)
    ids2 = sorted(
        r.doc_id for r in weighted_sample(df.repartition(13), 10, "w").collect()
    )
    assert ids1 == ids2
    # the 10 heavy rows (weight 1000 vs 1) dominate the sample
    heavy = [i for i in ids1 if i >= 90]
    assert len(heavy) >= 7


def test_sparse_topk_sums_duplicate_postings(spark):
    """Duplicate (id, tok) posting rows must ACCUMULATE — the operator's
    contract is 'identical to the posting-list join + groupBy sum', which a
    plain matrix assignment silently violated for unaggregated inputs
    (r9 ADVICE). Split postings must score exactly like their pre-summed
    equivalents, on both the doc and the query side."""
    from vstream_spark.operators.retrieval import sparse_topk

    vocab = ["a", "b", "c"]
    # doc 1: a x3 (as 1+2), b x1;  doc 2: a x1, c x5 (as 2+3)
    sp_dup = spark.createDataFrame(
        [(1, "a", 1), (1, "a", 2), (1, "b", 1), (2, "a", 1), (2, "c", 2), (2, "c", 3)],
        "doc_id bigint, tok string, tf bigint",
    )
    sp_agg = spark.createDataFrame(
        [(1, "a", 3), (1, "b", 1), (2, "a", 1), (2, "c", 5)],
        "doc_id bigint, tok string, tf bigint",
    )
    # query 10: a x2 (as 1+1), c x1
    q_dup = spark.createDataFrame(
        [(10, "a", 1), (10, "a", 1), (10, "c", 1)],
        "qid bigint, tok string, qtf bigint",
    )
    q_agg = spark.createDataFrame(
        [(10, "a", 2), (10, "c", 1)], "qid bigint, tok string, qtf bigint"
    )

    def rows(sp_df, q_df):
        return sorted(
            (r.qid, r.doc_id, r.score, r.rank)
            for r in sparse_topk(sp_df, q_df, vocab, k=5).collect()
        )

    # doc1: 3*2=6 (rank 2); doc2: 1*2+5*1=7 (rank 1)
    expect = [(10, 1, 6, 2), (10, 2, 7, 1)]
    got = rows(sp_dup, q_dup)
    assert got == rows(sp_agg, q_agg)
    assert got == expect


def test_sparse_topk_custom_column_names(spark):
    """tok/tf/qtf column names are parameterized like the id columns
    (r9 ADVICE: they were hardcoded, so the generic-looking signature only
    accepted q_knn_sparse_dot-shaped inputs)."""
    from vstream_spark.operators.retrieval import sparse_topk

    sp = spark.createDataFrame(
        [(1, "x", 2), (2, "y", 3)], "item bigint, term string, cnt bigint"
    )
    q = spark.createDataFrame([(7, "y", 4)], "query bigint, term string, w bigint")
    out = sparse_topk(
        sp, q, ["x", "y"], k=1, id_col="item", qid_col="query",
        tok_col="term", tf_col="cnt", qtf_col="w",
    ).collect()
    assert [(r["query"], r["item"], r.score, r.rank) for r in out] == [(7, 2, 12, 1)]


def test_sparse_topk_partition_invariant_survives_adversarial_layout(spark):
    """Mutation guard for the MUST-hash-partition-by-doc invariant
    (operators/retrieval.py): each doc's full posting set has to land in
    ONE partition or the partial top-k emits undercounted scores. The
    invariant is enforced by the operator's own repartition — so feed it
    an ADVERSARIALLY round-robined posting frame (every doc's postings
    deliberately scattered across many input partitions) and assert the
    result still matches the single-partition ground truth. A future edit
    that drops the repartition passes the existing tests (small inputs
    collapse to one task) but fails this one."""
    import random

    from vstream_spark.operators.retrieval import sparse_topk

    rng = random.Random(17)
    vocab = [f"t{j}" for j in range(20)]
    postings = [
        (doc, vocab[rng.randrange(20)], rng.randrange(1, 5))
        for doc in range(40)
        for _ in range(8)
    ]
    queries = [(q, vocab[rng.randrange(20)], rng.randrange(1, 4))
               for q in range(5) for _ in range(6)]

    def run(sp_df):
        return sorted(
            (r.qid, r.doc_id, r.score, r.rank)
            for r in sparse_topk(
                sp_df,
                spark.createDataFrame(queries, "qid bigint, tok string, qtf bigint"),
                vocab,
                k=7,
            ).collect()
        )

    base = spark.createDataFrame(postings, "doc_id bigint, tok string, tf bigint")
    want = run(base.coalesce(1))
    # scatter: round-robin across 16 partitions, so every doc's postings
    # span many tasks on the way IN
    got = run(base.repartition(16))
    assert want == got and len(want) > 0
