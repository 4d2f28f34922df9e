"""Scalar vector quantization — the storage-compression operator family (C5).

The reference compresses vector blocks with Gorilla XOR (``plugin/
vectorbackend/compression/compression.cc``); on Spark the at-rest analog is
Parquet encodings, but a training pipeline also wants *in-flight* compression:
int8 scalar quantization cuts shuffle and state size 4x for ANN-tolerant
workloads. Symmetric per-vector quantization, deterministic, reproducible in
plain SQL (the DuckDB oracle runs the same arithmetic):

    scale = max(|v_i|) / 127          (0 for the zero vector)
    q_i   = round(v_i / scale)        (int8 in [-127, 127])
    v_i'  = q_i * scale               (dequantized approximation)

All JVM-side Catalyst expressions — no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_expr(emb: Column) -> tuple[Column, Column]:
    """(scale DOUBLE, q ARRAY<TINYINT>) for a float-array column."""
    scale = F.aggregate(
        F.transform(emb, lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda acc, v: F.greatest(acc, v),
    ) / F.lit(127.0)
    q = F.transform(
        emb,
        lambda x: F.when(scale > 0.0, F.round(x.cast("double") / scale))
        .otherwise(F.lit(0.0))
        .cast("tinyint"),
    )
    return scale, q


def quantize(vectors: DataFrame, emb_col: str = "emb") -> DataFrame:
    """Add (scale, q) columns; keep the original embedding column out of the
    result — the compressed form IS the shipped representation."""
    scale, q = quantize_expr(F.col(emb_col))
    others = [c for c in vectors.columns if c != emb_col]
    return vectors.select(*others, scale.alias("scale"), q.alias("q"))


def dequantize(quantized: DataFrame, out_col: str = "emb") -> DataFrame:
    """Reconstruct ARRAY<FLOAT> from (scale, q)."""
    emb = F.transform(
        F.col("q"), lambda x: (x.cast("double") * F.col("scale")).cast("float")
    )
    others = [c for c in quantized.columns if c not in {"scale", "q"}]
    return quantized.select(*others, emb.alias(out_col))
