"""Text embedding via feature hashing (the embed step of an LLM data pipeline).

A deterministic, engine-stable stand-in for a model embedding: tokens are
hashed (md5 prefix — the same stable id scheme as MinHash) into ``dim``
buckets; a document's vector is its L2-normalized bucket term-frequency
histogram. Real model inference would slot into ``embed_text`` as a Pandas
UDF the same way; everything downstream (kNN, similarity join, dedup) is
oblivious to where the vectors came from.

Two forms:
  hashed_tf   — exploded (doc_id, bucket, tf): pure relational, duckdb-
                oracle-able, the 100 TB-friendly sparse representation
  embed_text  — dense ARRAY<FLOAT> per doc for the vector operators
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hashed_tf(
    docs: DataFrame, dim: int = 64, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Sparse hashed term frequencies: (doc_id, bucket INT, tf BIGINT).

    bucket = int(md5(token)[:15 hex]) % dim — identical arithmetic is
    expressible in any engine with md5 (the DuckDB oracle reproduces it
    bit-for-bit). All JVM-side: split/explode/md5/conv/groupBy.
    """
    toks = F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("tok")
    ex = docs.select(F.col(id_col).alias("doc_id"), toks)
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 15), 16, 10).cast("long") % dim
    ).cast("int")
    return (
        ex.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("tf"))
    )


def hashed_tf_sql(dim: int = 64) -> str:
    """DuckDB twin of hashed_tf over the ``documents`` view."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok FROM documents)
SELECT doc_id,
       CAST(('0x' || substring(md5(tok), 1, 15))::BIGINT % {dim} AS INTEGER) AS bucket,
       count(*) AS tf
FROM toks GROUP BY doc_id, bucket
"""


def embed_text(
    docs: DataFrame, dim: int = 64, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Dense L2-normalized hashed-TF embedding: (doc_id, emb ARRAY<FLOAT>).

    Entirely Catalyst (densify ``hashed_tf`` via map lookup + higher-order
    transforms): no Python in the hot path, so whole-stage codegen covers
    the full tokenize→hash→normalize pipeline. A real encoder model would
    replace this with a batched-inference Pandas UDF of the same signature
    (doc_id, emb) — everything downstream is oblivious.
    """
    tf = hashed_tf(docs, dim, text_col, id_col)
    sparse = tf.groupBy("doc_id").agg(
        F.map_from_arrays(
            F.collect_list("bucket"), F.collect_list(F.col("tf").cast("double"))
        ).alias("_m")
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.col("_m")[i.cast("int")], F.lit(0.0)),
    )
    densified = sparse.select("doc_id", dense.alias("_d")).withColumn(
        "_n", F.sqrt(F.aggregate("_d", F.lit(0.0), lambda acc, x: acc + x * x))
    )
    scale = F.when(F.col("_n") > 0, F.col("_n")).otherwise(F.lit(1.0))
    emb = F.transform("_d", lambda x: (x / scale).cast("float"))
    return densified.select("doc_id", emb.alias("emb"))
