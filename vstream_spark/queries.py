"""Declared query registry: name -> (spark_fn, oracle_sql).

This backs ``__spark_entry__.queries()`` / ``oracle_sql()``. Every operator
from SURVEY.md §2 that is implemented gets an entry here; SQL-expressible ones
carry a DuckDB oracle that must hash-match (column names aliased identically
on both sides — the driver sorts columns by name and hashes values).

Convention: each spark_fn takes (spark, sf_dir) and returns a DataFrame.
Oracles run on DuckDB with views region nation customer supplier part orders
lineitem events documents embeddings pre-registered on the same parquet.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vstream_spark.functions import distance as D
from vstream_spark.operators.knn import knn_exact
from vstream_spark.sources.tables import (
    QUERIES_FIXTURE_SQL,
    VECTORS_FIXTURE_SQL,
    load_table,
    queries_fixture,
    register_views,
    vectors_fixture,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

# registry: name -> (fn, oracle_sql | None)
REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = (fn, oracle)
        return fn

    return deco


def _emb_pair(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Vectors = all embeddings; queries = every 25th embedding (no TTL)."""
    emb = load_table(spark, sf_dir, "embeddings")
    vectors = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("emb"))
    queries = emb.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("emb")
    )
    return vectors, queries


def _knn_oracle(metric: str, k: int = 10) -> str:
    dist = D.distance_sql("q.embedding", "v.embedding", metric)
    return f"""
WITH scored AS (
  SELECT q.vec_id AS qid, v.vec_id AS neighbor_id, {dist} AS distance
  FROM embeddings v
  CROSS JOIN (SELECT * FROM embeddings WHERE vec_id % 25 = 0) q
), ranked AS (
  SELECT qid, neighbor_id, distance,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY distance ASC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, neighbor_id, distance, rank FROM ranked WHERE rank <= {k}
"""


def _make_knn_exact(metric: str) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        vectors, queries = _emb_pair(spark, sf_dir)
        return knn_exact(vectors, queries, k=10, metric=metric)

    return fn


for _metric in ("l2", "ip", "cosine"):
    register(f"knn_exact_{_metric}", _knn_oracle(_metric))(_make_knn_exact(_metric))


# --- kNN with TTL freshness + insert/delete stream semantics (W2/W3) --------

_KNN_TTL_ORACLE = f"""
WITH vectors AS ({VECTORS_FIXTURE_SQL}),
queries AS ({QUERIES_FIXTURE_SQL}),
inserts AS (SELECT * FROM vectors WHERE op = 'I'),
deletes AS (SELECT * FROM vectors WHERE op = 'D'),
live AS (
  SELECT i.* FROM inserts i
  WHERE NOT EXISTS (
    SELECT 1 FROM deletes d WHERE d.id = i.id AND d.event_time > i.event_time
  )
),
scored AS (
  SELECT q.qid, v.id AS neighbor_id, {D.l2sq_sql("q.emb", "v.emb")} AS distance, q.k AS k
  FROM live v
  JOIN queries q
    ON v.event_time >= q.event_time - q.ttl AND v.event_time <= q.event_time
),
ranked AS (
  SELECT qid, neighbor_id, distance, k,
         CAST(row_number() OVER (PARTITION BY qid ORDER BY distance ASC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
)
SELECT qid, neighbor_id, distance, rank FROM ranked WHERE rank <= k
"""


@register("knn_ttl_delete", _KNN_TTL_ORACLE)
def knn_ttl_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    vectors = vectors_fixture(spark, sf_dir)
    queries = queries_fixture(spark, sf_dir)
    return knn_exact(
        vectors, queries, k=None, metric="l2", honor_ttl=True, honor_deletes=True
    )


# --- Relational floor (SURVEY §2.7: Spark SQL provides these natively) ------
# TPC-H-shaped queries over the driver's star schema: they exercise scans,
# predicate pushdown, partial aggregation, broadcast joins and sorting — and
# serve as the bench workload's relational half.

_RELATIONAL: dict[str, str] = {
    # TPC-H Q1 shape: scan + filter + groupBy agg (map-side partial agg).
    "rel_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       CAST(round(sum(l_quantity), 2) AS DOUBLE) AS sum_qty,
       CAST(round(sum(l_extendedprice), 2) AS DOUBLE) AS sum_base_price,
       CAST(round(sum(l_extendedprice * (1 - l_discount)), 2) AS DOUBLE) AS sum_disc_price,
       CAST(round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS DOUBLE) AS sum_charge,
       CAST(round(avg(l_quantity), 6) AS DOUBLE) AS avg_qty,
       CAST(round(avg(l_extendedprice), 6) AS DOUBLE) AS avg_price,
       CAST(round(avg(l_discount), 6) AS DOUBLE) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    # TPC-H Q3 shape: 3-way join + agg + top-n.
    "rel_shipping_priority": """
SELECT l.l_orderkey AS orderkey,
       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS DOUBLE) AS revenue,
       o.o_orderdate AS orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, orderkey ASC
LIMIT 20
""",
    # TPC-H Q5 shape: 5-way star join through region/nation.
    "rel_local_supplier_volume": """
SELECT n.n_name AS nation,
       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
""",
    # TPC-H Q6 shape: pure filter + scalar agg (predicate pushdown showcase).
    "rel_revenue_forecast": """
SELECT CAST(round(sum(l_extendedprice * l_discount), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2024-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '2025-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
""",
    # Windowed event-stream rollup (events table; tumbling 1h windows).
    "rel_event_rollup": """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       CAST(round(sum(value), 4) AS DOUBLE) AS sum_value,
       CAST(round(avg(value), 6) AS DOUBLE) AS avg_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
    # Top-k per group via window function (M1 merge machinery, relational form).
    "rel_top_orders_per_cust": """
WITH ranked AS (
  SELECT o_custkey AS custkey, o_orderkey AS orderkey, o_totalprice AS totalprice,
         CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rank
  FROM orders
)
SELECT custkey, orderkey, CAST(totalprice AS DOUBLE) AS totalprice, rank
FROM ranked WHERE rank <= 3
""",
}


def _make_relational(sql: str) -> QueryFn:
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)

    return fn


for _name, _sql in _RELATIONAL.items():
    register(_name, _sql)(_make_relational(_sql))
