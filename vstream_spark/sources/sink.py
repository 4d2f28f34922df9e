"""Result sink with the reference's golden text encoding (S5).

``SearchResultEncoder.encode`` (``data/result/SearchResultEncoder.java:32-41``)
writes one line per completed query:

    <qid> <duration> <id>,<dist> <id>,<dist> ...\n

duration = searchCompleteTime − queryEventTime (ms); neighbor pairs ascend by
(distance, id). We keep the format bit-identical for parity tests; the Spark
sink is an ordinary ``df.write.text`` over a JVM-side string aggregation — no
Python in the write path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def encode_results(results: DataFrame, duration_col: str | None = None) -> DataFrame:
    """(qid, neighbor_id, distance, rank[, duration]) -> one-line-per-query
    DataFrame (qid, line) in the reference's sink format."""
    dur = F.col(duration_col) if duration_col else F.lit(0)
    pairs = F.array_sort(
        F.collect_list(F.struct(F.col("rank"), F.col("neighbor_id"), F.col("distance")))
    )
    per_q = results.groupBy("qid").agg(
        F.first(dur).alias("_dur"), pairs.alias("_pairs")
    )
    line = F.concat_ws(
        " ",
        F.col("qid").cast("string"),
        F.col("_dur").cast("string"),
        F.array_join(
            F.transform(
                "_pairs",
                lambda p: F.concat_ws(
                    ",",
                    p["neighbor_id"].cast("string"),
                    p["distance"].cast("float").cast("string"),
                ),
            ),
            " ",
        ),
    )
    return per_q.select("qid", line.alias("line"))


def write_results(results: DataFrame, path: str, duration_col: str | None = None) -> None:
    """Write the encoded lines as text files (FileSink row-format analog,
    ``VStreamSearchJob.java:42-46``)."""
    encode_results(results, duration_col).select("line").write.mode("overwrite").text(path)
