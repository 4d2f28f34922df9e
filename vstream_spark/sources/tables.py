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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise ValueError(f"unknown table {name!r}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANO_TS_COLS.get(name, ()):
        if col in df.columns and dict(df.dtypes)[col] == "bigint":
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"CAST({col} DIV 1000 AS BIGINT)"))
            )
    return df


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register testdata tables as temp views (same names DuckDB pre-registers)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def vectors_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 vector stream (id, emb, event_time, ttl, op) derived from embeddings."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
    return spark.sql(VECTORS_FIXTURE_SQL)


def queries_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 query stream (qid, emb, event_time, ttl, k) derived from embeddings."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
    return spark.sql(QUERIES_FIXTURE_SQL)
