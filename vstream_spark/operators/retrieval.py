"""Keyword + hybrid retrieval (BM25, reciprocal-rank fusion).

The reference serves dense vector search; the capability every production
deployment pairs with it is keyword scoring and score fusion — "hybrid
search". Both halves are deterministic relational pipelines here:

  bm25        — Okapi BM25 (Lucene idf variant: ln(1 + (N-df+.5)/(df+.5)))
                over the whitespace token stream. All aggregates are exact
                integers until the final double arithmetic, so the DuckDB
                twin reproduces scores bitwise (rounded 6dp before ranking).
  rrf_fuse    — Reciprocal Rank Fusion: sum of 1/(k0 + rank) over input
                rankings (Cormack et al.): rank arithmetic only, engine-
                exact, the standard zero-tuning fusion for hybrid search.

Scale shape: BM25 is two token-stream aggregations (tf per (doc, term); dl
per doc) plus an O(terms) broadcast — the token exchange is the only big
shuffle and it is map-side combined. RRF joins k-row rankings — trivial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_dp: int = 6,
) -> DataFrame:
    """BM25 score of every document against the term set.

    Returns (doc_id, score) for docs matching >= 1 term; score rounded to
    ``round_dp`` so cross-engine ln()/division last-ulp noise can never
    reorder a downstream ranking.
    """
    n_docs = docs.count()  # O(1) driver scalar, exact
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("tok"),
    )
    # dl is consumed twice — the avgdl scalar below and the scored join: pin
    # it (lazily; the avgdl collect materializes it) so the token explode
    # runs once for both, not once per consumer
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl")).localCheckpoint(
        eager=False
    )
    # avgdl from exact integer sums -> identical double in any engine
    tot = dl.agg(F.sum("dl").alias("s"), F.count("*").alias("c")).collect()[0]
    avgdl = float(tot["s"]) / float(tot["c"])
    tf = (
        toks.filter(F.col("tok").isin(list(terms)))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("tok").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    scored = (
        tf.join(F.broadcast(df_t.withColumn("idf", idf).select("tok", "idf")), "tok")
        .join(dl, "doc_id")
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.lit(avgdl))
            ),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.round(F.sum("contrib"), round_dp).cast("double").alias("score")
    )


def bm25_sql(
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    round_dp: int = 6,
) -> str:
    """DuckDB twin of ``bm25`` over the ``documents`` view — identical
    expression tree, identical rounding."""
    term_list = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         CAST((SELECT sum(dl) FROM dl) AS DOUBLE) / CAST((SELECT count(*) FROM dl) AS DOUBLE) AS avgdl),
tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM toks
  WHERE tok IN ({term_list}) GROUP BY doc_id, tok),
dft AS (
  SELECT tok, count(*) AS df,
         ln(1.0 + (CAST((SELECT n_docs FROM stats) AS DOUBLE) - df + 0.5) / (df + 0.5)) AS idf
  FROM tf GROUP BY tok),
contrib AS (
  SELECT tf.doc_id,
         dft.idf * (tf.tf * {k1 + 1.0!r}) /
           (tf.tf + {k1!r} * ({1.0 - b!r} + {b!r} * dl.dl / (SELECT avgdl FROM stats))) AS contrib
  FROM tf JOIN dft USING (tok) JOIN dl USING (doc_id))
SELECT doc_id, CAST(round(sum(contrib), {round_dp}) AS DOUBLE) AS score
FROM contrib GROUP BY doc_id
"""


def rrf_fuse(
    rankings: list[DataFrame],
    k0: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal Rank Fusion: rrf = sum over rankings of 1/(k0 + rank).

    Each input is (id, rank). A doc missing from a ranking contributes 0
    (the standard convention). Pure rank arithmetic — exact sums of a few
    IEEE-identical divisions, so no rounding is needed cross-engine.
    """
    parts = [
        r.select(
            F.col(id_col).alias("doc_id"),
            (F.lit(1.0) / (F.lit(float(k0)) + F.col(rank_col).cast("double"))).alias(
                "c"
            ),
        )
        for r in rankings
    ]
    allc = parts[0]
    for p in parts[1:]:
        allc = allc.unionByName(p)
    return allc.groupBy("doc_id").agg(F.sum("c").alias("rrf_score"))


def mmr_rerank(
    candidates: DataFrame,
    k: int = 10,
    lam: float = 0.5,
    qid_col: str = "qid",
    id_col: str = "neighbor_id",
    emb_col: str = "emb",
    rel_col: str = "rel",
) -> DataFrame:
    """Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998): per
    query, greedily pick argmax ``lam * rel - (1 - lam) * max_sim_to_
    selected`` — the standard diversity rerank after a first-stage
    retrieval. Inherently sequential per query, so it runs as a per-qid
    ``applyInPandas`` over the CANDIDATE set (first-stage top-N, N ~ tens)
    — the greedy loop touches N^2 floats per query, never the corpus, and
    queries parallelize across executors. Deterministic: ties break to the
    smaller id. Returns (qid, neighbor_id, rank)."""
    import numpy as np
    import pandas as pd

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        rel = pdf[rel_col].to_numpy().astype(np.float64)
        mat = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
        nrm = np.sqrt((mat * mat).sum(axis=1))
        nrm[nrm == 0.0] = 1.0
        unit = mat / nrm[:, None]
        sims = unit @ unit.T
        order = np.lexsort((ids, -rel))  # rel desc, id asc
        selected: list[int] = [int(order[0])]
        remaining = [int(i) for i in order[1:]]
        while remaining and len(selected) < k:
            best_i, best_key = None, None
            for i in remaining:
                score = lam * rel[i] - (1.0 - lam) * sims[i, selected].max()
                key = (score, -int(ids[i]))
                if best_key is None or key > best_key:
                    best_i, best_key = i, key
            selected.append(best_i)
            remaining.remove(best_i)
        return pd.DataFrame(
            {
                qid_col: pdf[qid_col].iloc[: len(selected)].to_numpy()[0].repeat(
                    len(selected)
                ),
                id_col: ids[selected],
                "rank": np.arange(1, len(selected) + 1, dtype=np.int32),
            }
        )

    return candidates.groupBy(qid_col).applyInPandas(
        pick, schema=f"{qid_col} bigint, {id_col} bigint, rank int"
    )


def sparse_topk(
    sp: DataFrame,
    q: DataFrame,
    vocab: list[str],
    k: int = 5,
    id_col: str = "doc_id",
    qid_col: str = "qid",
    tok_col: str = "tok",
    tf_col: str = "tf",
    qtf_col: str = "qtf",
) -> DataFrame:
    """Exact top-k sparse dot-product retrieval as a partitioned matmul with
    a partial top-k merge (the M1 pattern applied to the inverted index).

    ``sp``: (id_col, tok_col, tf_col) posting rows over ``vocab``;
    ``q``: (qid_col, tok_col, qtf_col) posting rows of the query batch.
    Returns (qid, id, score BIGINT, rank) with score desc / id asc ranking,
    pairs sharing >= 1 term only — identical semantics to the posting-list
    join + groupBy(qid, doc) sum. Duplicate (id, tok) posting rows SUM
    (r9 ADVICE: plain matrix assignment silently overwrote them, diverging
    from the join+sum contract for unaggregated inputs).

    Why not the pure join: candidate volume is sum_t qdf(t) * df(t), which
    grows ~df^2 in corpus size — the sf1 rehearsal measured the join shape
    at 23x on 10x data even after broadcasting the query side (the residual
    is materializing billions of (qid, doc, term) rows through codegen).
    Here each partition of the posting table builds its local dense
    (docs_in_partition x |vocab|) count matrix and scores ALL queries in one
    BLAS matmul — float64 is exact (integer counts, products << 2^53) — then
    emits only its local top-k per query. The global window keeps the true
    top-k: every globally-ranked row is its partition's local top-k too, so
    the partial emit loses nothing (same completeness argument as the
    partitioned kNN merge).

    Scale posture: the query batch (|Q| x |vocab| weights) is driver-collected
    and closure-shipped — queries are the bounded small side by construction
    (same constraint as every broadcast-q path here). Per-task memory is
    O(docs_in_partition x |vocab| + |Q| x |vocab|); widen/repartition bounds
    the former, and a 100 TB corpus raises the partition COUNT, not the
    per-task matrix. Shuffle: only the (partitions x |Q| x k) partial top-k
    rows — no posting pair ever leaves an executor.
    """
    import numpy as np
    import pandas as pd

    tok2j = {t: j for j, t in enumerate(vocab)}
    nv = len(vocab)
    q_rows = q.collect()
    qids = np.array(sorted({r[qid_col] for r in q_rows}), dtype=np.int64)
    qidx = {int(v): i for i, v in enumerate(qids)}
    qmat = np.zeros((len(qids), nv), dtype=np.float64)
    for r in q_rows:
        j = tok2j.get(r[tok_col])
        if j is not None:
            # += so duplicate query postings accumulate (join+sum parity)
            qmat[qidx[int(r[qid_col])], j] += float(r[qtf_col])

    def score_partition(batches):
        ids_parts, j_parts, tf_parts = [], [], []
        for pdf in batches:
            jcol = pdf[tok_col].map(tok2j)
            keep = jcol.notna()
            ids_parts.append(pdf[id_col].to_numpy()[keep])
            j_parts.append(jcol.to_numpy()[keep].astype(np.int64))
            tf_parts.append(pdf[tf_col].to_numpy()[keep].astype(np.float64))
        if not ids_parts:
            return
        ids = np.concatenate(ids_parts)
        if len(ids) == 0:
            return
        js = np.concatenate(j_parts)
        tfs = np.concatenate(tf_parts)
        local_ids, inv = np.unique(ids, return_inverse=True)
        # bincount over the flattened (doc, tok) index SUMS duplicate
        # posting rows (vectorized np.add.at): identical to the posting
        # join + sum for any input, not just pre-aggregated tf
        dmat = np.bincount(
            inv * nv + js, weights=tfs, minlength=len(local_ids) * nv
        ).reshape(len(local_ids), nv)
        scores = dmat @ qmat.T  # exact: integer-valued float64 products
        out_q, out_d, out_s = [], [], []
        for c in range(scores.shape[1]):
            col = scores[:, c]
            pos = np.flatnonzero(col > 0.0)
            if len(pos) == 0:
                continue
            order = pos[np.lexsort((local_ids[pos], -col[pos]))][:k]
            out_q.append(np.full(len(order), qids[c], dtype=np.int64))
            out_d.append(local_ids[order].astype(np.int64))
            out_s.append(col[order].astype(np.int64))
        if out_q:
            yield pd.DataFrame(
                {
                    qid_col: np.concatenate(out_q),
                    id_col: np.concatenate(out_d),
                    "score": np.concatenate(out_s),
                }
            )

    # MUST hash-partition by the doc id: correctness of the partial top-k
    # depends on each doc's full posting set landing in ONE partition (a
    # round-robin widen would split a doc across tasks and emit partial
    # undercounted scores). Width scales with the corpus, floored at the
    # session parallelism.
    par = sp.sparkSession.sparkContext.defaultParallelism
    width = max(par, sp.rdd.getNumPartitions())
    partial = (
        sp.select(id_col, tok_col, tf_col)
        .repartition(width, id_col)
        .mapInPandas(
            score_partition, f"{qid_col} long, {id_col} long, score long"
        )
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        partial.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
    )
