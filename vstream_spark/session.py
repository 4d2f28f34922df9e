"""SparkSession factory for the vstream-spark engine.

Defaults target the driver's harness (local[$SPARK_GRAFT_CPUS], 32 shuffle
partitions) but every knob is scale-aware: AQE on (runtime coalesce + skew-join
splitting), Arrow on (all custom operators move data in Arrow batches), zstd
parquet. On a real cluster the same factory is used with a different master and
a larger ``spark.sql.shuffle.partitions`` (rule of thumb: 2-3x total cores, or
target ~128MB per shuffle partition at the expected data volume).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Scale-aware defaults. On 100 TB inputs the file-split and shuffle sizing
# below keep individual tasks in the 100-200MB range so no single task spills;
# AQE re-coalesces small post-shuffle partitions and splits skewed ones.
_DEFAULT_CONF: dict[str, str] = {
    # local-mode JVM sizing: the driver IS the executor for all 32 task
    # threads, and Spark's 1g default heap leaves them GC-thrashing (observed:
    # late-suite queries degrade 2-3x once broadcast/plan state accumulates).
    # Only applies at JVM launch — a real cluster sizes executors via the
    # resource manager instead.
    "spark.driver.memory": "48g",
    "spark.sql.adaptive.enabled": "true",
    # Pin the session tz: makes TIMESTAMP_NTZ <-> TIMESTAMP casts (needed for
    # streaming watermarks over the driver's NTZ parquet) value-preserving
    # and keeps window boundaries deterministic across machines.
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Arrow batch size for pandas UDF exchange: large enough to amortize
    # Python call overhead, small enough to bound worker memory.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.parquet.compression.codec": "zstd",
    # Driver testdata carries TIMESTAMP(NANOS) parquet columns, which Spark
    # rejects natively; read as int64 nanos and convert in load_table.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Vector columns are float32 arrays: byte-stream-split encoding is the
    # Parquet analog of the reference's Gorilla XOR compression (SURVEY C5/O8).
    "spark.sql.parquet.columnarReaderBatchSize": "4096",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.shuffle.partitions": "32",
    # InferFiltersFromGenerate rewrites explode(udf(x)) into
    # Filter(size(udf(x))>0) + explode(udf(x)) and the Python-UDF extraction
    # then evaluates the UDF TWICE (one ArrowEvalPython for the filter, one
    # for the generator input) — a duplicated whole-corpus Python pass in
    # every partitioner-dispatch and shingle-explode plan. Generate already
    # skips empty/null arrays, so the inferred filter buys nothing here;
    # excluding the rule halves the ArrowEvalPython nodes in those plans.
    "spark.sql.optimizer.excludedRules":
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    "spark.ui.enabled": "false",
    "spark.driver.host": "127.0.0.1",
}


def get_spark(
    app_name: str = "vstream-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver convention),
    falling back to ``local[*]``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULT_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for key, value in conf.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
