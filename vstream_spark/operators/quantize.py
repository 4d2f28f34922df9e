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


def scale_expr(emb: Column) -> Column:
    """``max(|v_i|) / 127`` — the per-vector symmetric quantization scale.

    Callers MUST materialize this as a column (one ``select``) before
    feeding it to :func:`quantize_expr`: referenced inline inside the code
    lambda, Catalyst re-evaluates the whole fold PER ARRAY ELEMENT
    (higher-order functions are interpreted and never common-subexpression-
    eliminated inside a lambda) — measured 2.9x on the knn_quantized query
    at sf0.1 (2.91 s inline vs 1.00 s hoisted, bitwise-identical results).
    """
    return (
        F.aggregate(
            F.transform(emb, lambda x: F.abs(x.cast("double"))),
            F.lit(0.0),
            lambda acc, v: F.greatest(acc, v),
        )
        / F.lit(127.0)
    )


def quantize_expr(emb: Column, scale: Column | None = None) -> tuple[Column, Column]:
    """(scale DOUBLE, q ARRAY<TINYINT>) for a float-array column.

    Pass ``scale`` as a pre-materialized COLUMN (see :func:`scale_expr`)
    whenever the codes are computed in a DataFrame pipeline; the
    ``scale=None`` inline form is kept for expression-level callers and
    produces identical values, just slower."""
    if scale is None:
        scale = scale_expr(emb)
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
    others = [c for c in vectors.columns if c != emb_col]
    pre = vectors.select(
        *others, F.col(emb_col), scale_expr(F.col(emb_col)).alias("scale")
    )
    _, q = quantize_expr(F.col(emb_col), scale=F.col("scale"))
    return pre.select(*others, "scale", q.alias("q"))


def dequantize(quantized: DataFrame, out_col: str = "emb") -> DataFrame:
    """Reconstruct ARRAY<FLOAT> from (scale, q)."""
    emb = F.transform(
        F.col("q"), lambda x: (x.cast("double") * F.col("scale")).cast("float")
    )
    others = [c for c in quantized.columns if c not in {"scale", "q"}]
    return quantized.select(*others, emb.alias(out_col))
