"""Testdata table loading + deterministic vector-stream fixture derivation.

The driver provides relational parquet tables (TESTDATA.md). The vector
fixtures of FIXTURES.md §A1/§A2 (insert/delete stream + query stream with
event-time and TTL) are derived **deterministically from the embeddings
table** with pure SQL so that the DuckDB oracle can derive the identical
fixture — the derivation below is written in the common SQL dialect of Spark
and DuckDB (CASE/%, scalar subqueries, CAST) and is executed verbatim by both
engines.

Fixture scheme (seeded by vec_id, N = count(embeddings)):
  inserts:  id=vec_id, emb=embedding, event_time=1000*(vec_id+1), op='I'
  deletes:  every vec_id % 10 == 7 (vec_id>=5) emits a delete of id=vec_id-5
            at event_time=1000*(vec_id+1)+500  — mirrors the reference's
            synthetic delete-marker generation at deleteRatio~0.1 reusing
            recently inserted ids (FloatVectorBinaryInputFormat.java:232-234,
            365-407; params.yaml deleteRatio: 0.1)
  queries:  every vec_id % 25 == 0, arriving after all inserts
            (event_time=1000*N+999) with ttl=600*N — so the TTL window keeps
            only the most recent ~60% of inserts eligible, and all delete
            markers are in the past (freshness semantics of
            DataSerializer.java:48-56, memtable.cc:1283-1288).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# SQL bodies shared verbatim between Spark and DuckDB. Delete rows reuse the
# embedding value (ignored downstream) to avoid dialect-specific typed NULLs.
VECTORS_FIXTURE_SQL = """
SELECT vec_id AS id,
       embedding AS emb,
       CAST(1000 * (vec_id + 1) AS BIGINT) AS event_time,
       CAST(1000000000 AS BIGINT) AS ttl,
       'I' AS op
FROM embeddings
UNION ALL
SELECT vec_id - 5 AS id,
       embedding AS emb,
       CAST(1000 * (vec_id + 1) + 500 AS BIGINT) AS event_time,
       CAST(1000000000 AS BIGINT) AS ttl,
       'D' AS op
FROM embeddings
WHERE vec_id % 10 = 7 AND vec_id >= 5
"""

QUERIES_FIXTURE_SQL = """
SELECT vec_id AS qid,
       embedding AS emb,
       CAST(1000 * (SELECT count(*) FROM embeddings) + 999 AS BIGINT) AS event_time,
       CAST(600 * (SELECT count(*) FROM embeddings) AS BIGINT) AS ttl,
       10 AS k
FROM embeddings
WHERE vec_id % 25 = 0
"""


# Columns stored as TIMESTAMP(NANOS) in the driver parquet. Spark reads them
# as int64 nanos (spark.sql.legacy.parquet.nanosAsLong); we convert to proper
# timestamps with DuckDB's semantics (truncate ns -> us) so both engines see
# identical values.
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


# Plan cache for the table loaders. Every ``spark.read.parquet`` pays a
# driver round trip of file listing + footer schema inference, and the
# nanos->timestamp conversion below adds schema analysis + expression
# parsing; the bench suite builds each table's reader hundreds of times per
# session (one per query x repeat, and the relational queries register all
# ten views each call), so the repeated metadata work is pure per-query
# fixed cost. Cached handles hold only the LOGICAL PLAN — every action
# still scans parquet — so this is metadata reuse (Spark's own
# FileIndex-caching discipline), not result caching. Keyed by
# (applicationId, realpath, mtime_ns, size, raw_filter): a session restart
# or a rewritten file can never hit a stale entry.
_TABLE_PLAN_CACHE: dict[tuple, DataFrame] = {}


def _table_cache_key(
    spark: SparkSession, path: str, raw_filter: str | None
) -> tuple | None:
    try:
        st = os.stat(path)
    except OSError:
        return None  # directory-shaped or remote: no cache
    sc = spark.sparkContext
    app_id = getattr(sc, "_vstream_app_id", None)
    if app_id is None:
        app_id = sc.applicationId
        sc._vstream_app_id = app_id  # one py4j round trip per session
    return (app_id, os.path.realpath(path), st.st_mtime_ns, st.st_size, raw_filter)


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    raw_filter: str | None = None,
    raw_filter_col: str | None = None,
) -> DataFrame:
    """Load one testdata table, converting TIMESTAMP(NANOS) columns.

    ``raw_filter`` is an optional SQL predicate evaluated against the RAW
    int64-nanos columns BEFORE the timestamp conversion, so it reaches the
    parquet scan as a pushable plain-column comparison (PushedFilters) —
    the converted column is a derived expression Spark cannot push. Callers
    must pass a predicate IMPLIED by the query's own filters (see the
    relational queries), so results are unchanged. ``raw_filter_col`` guards
    the application: the filter is applied only when that column reads as
    int64 (nanosAsLong) — against a session that reads real timestamps the
    int64 bound would be a DIFFERENT predicate, so it is skipped (skipping
    is always sound: the filter is redundant with the query's own WHERE).
    """
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}")
    path = f"{sf_dir}/{name}.parquet"
    key = _table_cache_key(spark, path, raw_filter)
    if key is not None:
        cached = _TABLE_PLAN_CACHE.get(key)
        if cached is not None:
            return cached
    df = spark.read.parquet(path)
    kinds = dict(df.dtypes)
    if raw_filter and (raw_filter_col is None or kinds.get(raw_filter_col) == "bigint"):
        df = df.filter(raw_filter)
    for col in _NANO_TS_COLS.get(name, ()):
        if kinds.get(col) == "bigint":
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"CAST({col} DIV 1000 AS BIGINT)"))
            )
    if key is not None:
        if len(_TABLE_PLAN_CACHE) >= 256:
            _TABLE_PLAN_CACHE.clear()  # dead-session bound; entries are tiny
        _TABLE_PLAN_CACHE[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register testdata tables as temp views (same names DuckDB pre-registers)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def _fixture_plan(spark: SparkSession, sf_dir: str, tag: str, sql: str) -> DataFrame:
    """Analyze a fixture's SQL once per (session, embeddings file): the SQL
    text is a constant and the resolved plan only references the embeddings
    scan, so the same plan-cache discipline as ``load_table`` applies (the
    parse + analyze of the scalar-subquery SQL is pure per-call driver
    cost). The temp view is still (re-)registered on a miss."""
    key = _table_cache_key(spark, f"{sf_dir}/embeddings.parquet", tag)
    if key is not None:
        cached = _TABLE_PLAN_CACHE.get(key)
        if cached is not None:
            return cached
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
    df = spark.sql(sql)
    if key is not None:
        _TABLE_PLAN_CACHE[key] = df
    return df


def vectors_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 vector stream (id, emb, event_time, ttl, op) derived from embeddings."""
    return _fixture_plan(spark, sf_dir, "::vectors_fixture", VECTORS_FIXTURE_SQL)


def queries_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 query stream (qid, emb, event_time, ttl, k) derived from embeddings."""
    return _fixture_plan(spark, sf_dir, "::queries_fixture", QUERIES_FIXTURE_SQL)
