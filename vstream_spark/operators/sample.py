"""Deterministic sampling / splitting — training-corpus staples.

``df.sample()`` is seed-dependent per partitioning and non-reproducible
across engines; these operators derive keep/assign decisions from an
md5 hash of a stable key, so the same row gets the same fate on any
engine, any partitioning, any cluster size — and the DuckDB oracle can
reproduce the selection bit-for-bit (same trick as the MinHash/hashed-TF
family: md5-prefix integer arithmetic).

All pure Catalyst: a scan + filter/project that pushes down and codegens;
zero shuffles, scales linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# hash granularity: decisions are exact integer comparisons at 1e-6
_DENOM = 1_000_000


def _hash_bucket(key: Column, seed: int) -> Column:
    """Uniform bucket in [0, 1e6) from md5(seed|key) — 60-bit prefix, then
    modulo (bias 2^60 % 1e6 / 2^60 ~ 1e-13, irrelevant at any corpus size)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}|"), key.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return h % _DENOM


def hash_bucket_sql(key_sql: str, seed: int) -> str:
    """DuckDB twin of ``_hash_bucket`` (HUGEINT-safe)."""
    return (
        f"(('0x' || substring(md5('{seed}|' || CAST({key_sql} AS VARCHAR)), 1, 15))"
        f"::BIGINT % {_DENOM})"
    )


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows by key hash."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    return df.filter(_hash_bucket(F.col(key_col), seed) < int(rate * _DENOM))


def stratified_hash_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. rebalance languages in a
    training mix: upsample rare langs to rate 1.0, downsample the head).

    Rows whose stratum has no configured rate keep ``default_rate``.
    """
    threshold = F.lit(int(default_rate * _DENOM))
    for stratum, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(stratum_col) == stratum, F.lit(int(rate * _DENOM))
        ).otherwise(threshold)
    return df.filter(_hash_bucket(F.col(key_col), seed) < threshold)


def hash_split(
    df: DataFrame,
    weights: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 42,
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split (train/val/test) by hash
    range — disjoint, exhaustive, stable under data growth: a row's split
    never changes when other rows are added or the frame is repartitioned.
    """
    total = sum(weights.values())
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    bucket = _hash_bucket(F.col(key_col), seed)
    expr = None
    acc = 0.0
    items = sorted(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cond = bucket < int(acc * _DENOM)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(split_col, expr)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    max_rows: int,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-group cap (e.g. at most N documents per source
    domain — the anti-overrepresentation step of a corpus mix). Rows are
    ranked inside each group by (hash, key) — a stable shuffle — and ranks
    above ``max_rows`` are dropped. One exchange on the group key; the
    window is rank-limited so AQE's WindowGroupLimit prunes per-task.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        _hash_bucket(F.col(key_col), seed).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_rows)
        .drop("_rk")
    )
