"""Skew-mitigation join: explicit key salting.

AQE's skew-join splitting (enabled in ``session.py``) handles most skew at
runtime, but it only kicks in for sort-merge joins after a shuffle has
already materialized the skewed partition's map output. Salting attacks the
problem BEFORE the shuffle: the big side spreads each hot key over N salt
buckets, the small side replicates each row N times, and the join runs on
(key, salt) — every shuffle partition is bounded at 1/N of the hottest key.
That is the standard fix for joins AQE can't split (broadcast-ineligible
dimension with one giant key, streaming joins, pre-3.0 clusters) and for
skewed aggregations (two-stage partial on (key, salt) then final on key).

The result is IDENTICAL to the plain join — salting is a physical rewrite,
which is exactly what the DuckDB oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` to ``small`` on column ``on`` with ``n_salts``-way key
    salting. ``small`` is replicated n_salts times (cost: n_salts * |small|
    shuffle rows — only worth it when |small| is modest but too big or too
    skew-prone to broadcast). Deterministic: the big side's salt is a hash of
    the WHOLE row (not the join key — every row of a hot key must land in a
    different bucket, and not a random draw — re-runs must partition
    identically)."""
    big_s = big.withColumn(
        _SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)).cast(
            "int"
        ),
    )
    small_s = small.withColumn(
        _SALT, F.explode(F.array([F.lit(i) for i in range(n_salts)]))
    )
    # force a shuffled hash join: broadcasting the replicated small side
    # would silently bypass the salting (and the scenario this operator is
    # for is precisely "small side too big/hot to broadcast")
    return big_s.join(small_s.hint("shuffle_hash"), [on, _SALT], how).drop(_SALT)
