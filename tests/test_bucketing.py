"""Bucketed co-located joins: the zero-shuffle strategy for repeated joins.

At 100 TB a fact-fact join (lineitem x orders) re-shuffles both sides every
query. Writing both tables bucketed (+sorted) by the join key co-locates
matching keys at WRITE time; every later join on that key runs as a
SortMergeJoin with NO exchange on either side — the write-once/join-many
trade every warehouse makes for its hot join keys.
"""

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vstream_spark.sources.tables import load_table


def test_bucketed_join_runs_without_shuffle(spark, tmp_path):
    li = load_table(spark, SF_SMALL, "lineitem").select(
        F.col("l_orderkey").alias("orderkey"), "l_quantity"
    )
    orders = load_table(spark, SF_SMALL, "orders").select(
        F.col("o_orderkey").alias("orderkey"), "o_orderpriority"
    )
    for name, df in (("li_bkt", li), ("ord_bkt", orders)):
        (
            df.write.bucketBy(8, "orderkey")
            .sortBy("orderkey")
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    try:
        joined = (
            spark.table("li_bkt")
            .hint("merge")  # forbid broadcast: the point is the bucket join
            .join(spark.table("ord_bkt"), "orderkey")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # co-located buckets: neither side shuffles
        assert "Exchange hashpartitioning" not in plan
        # and the result is the plain join
        expected = li.join(orders, "orderkey").count()
        assert joined.count() == expected
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS ord_bkt")
