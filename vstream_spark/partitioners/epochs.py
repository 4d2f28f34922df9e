"""Streaming epoch re-learning for the P5 curve partitioners.

The paper's headline behavior (``LSHashSpaceFillingPartitioner.java:118-145,
314-355``): every ``updateInterval`` the partitioner re-learns equi-depth
quantile boundaries from the trailing history window (``summarizeHistory``),
opening a new *epoch*; data is routed by the boundaries of its OWN epoch
(``getDataPartition:266-312``), and queries fan out to their partition in
every FRESH epoch — epochs whose time range can still hold data inside the
query's ``[event_time - max_ttl, event_time]`` window (``isFresh:353-355``).

The batch ``CurvePartitioner`` (dispatch.py) learns all epochs in one fit
with a shared sketch normalization. This module is the streaming variant:
``EpochCurvePartitioner.update(batch)`` is called once per micro-batch
(foreachBatch) and learns per-epoch state — normalization range AND quantile
boundaries — for any epoch the batch opens, so a distribution shift between
epochs re-partitions cleanly instead of clipping against a stale range.

Driver state is O(epochs x (num_hashes + P)) floats — the learned summaries,
never the data (the history sample that feeds one quantile fit is bounded by
``conf.max_retained`` rows, the reference's maxHistorySize).
"""

from __future__ import annotations

import bisect

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType

from vstream_spark.config import PartitionerConf
from vstream_spark.partitioners.curves import CURVES
from vstream_spark.partitioners.dispatch import _explode_pids, _families


class EpochState:
    """Learned summary of one epoch: sketch range + equi-depth boundaries."""

    __slots__ = ("lo", "hi", "boundaries")

    def __init__(self, lo: np.ndarray, hi: np.ndarray, boundaries: list[float]):
        self.lo = lo
        self.hi = hi
        self.boundaries = boundaries


class EpochCurvePartitioner:
    """P5 with per-micro-batch epoch re-learning (streaming dynamic mode).

    ``curve`` ∈ CURVES; ``use_lsh=True`` sketches with the seeded p-stable
    families first (lsh+<curve>), ``False`` curves the leading raw dims (P9).
    """

    def __init__(self, conf: PartitionerConf, curve: str = "hilbert", use_lsh: bool = True):
        if use_lsh and conf.num_hashes * conf.sfc_bits > 62:
            raise ValueError("num_hashes * sfc_bits must be <= 62 (int64 curve index)")
        self.conf = conf
        self.curve_name = curve
        self.curve = CURVES[curve]
        self.use_lsh = use_lsh
        self.max_dims = max(1, 62 // conf.sfc_bits)
        self.epochs: dict[int, EpochState] = {}

    # -- learning ------------------------------------------------------------

    def _sketch(self, mat: np.ndarray) -> np.ndarray:
        return (
            _families(mat.shape[1], self.conf).hash_values(mat, 0)
            if self.use_lsh
            else mat[:, : self.max_dims]
        )

    def update(self, batch: DataFrame, emb_col: str = "emb") -> list[int]:
        """Learn state for every epoch present in ``batch`` that has none yet
        (each epoch is learned once, from the rows of the micro-batch that
        opens it — the bounded-history ``summarizeHistory`` analog). Returns
        the newly learned epoch ids."""
        conf = self.conf
        known = set(self.epochs)
        eps = (
            batch.select(
                (F.col("event_time") / F.lit(conf.update_interval))
                .cast("long")
                .alias("_epoch")
            )
            .distinct()
            .collect()
        )
        fresh = sorted(int(r["_epoch"]) for r in eps if int(r["_epoch"]) not in known)
        for ep in fresh:
            sample = (
                batch.filter(
                    (F.col("event_time") / F.lit(conf.update_interval)).cast("long")
                    == ep
                )
                .select(emb_col)
                .limit(conf.max_retained)
                .toPandas()
            )
            mat = np.stack(sample[emb_col].to_numpy()).astype(np.float64)
            sk = self._sketch(mat)
            lo, hi = sk.min(axis=0), sk.max(axis=0)
            side = 1 << conf.sfc_bits
            span = np.where((hi - lo) > 0, hi - lo, 1.0)
            coords = np.clip(((sk - lo) / span * side).astype(np.int64), 0, side - 1)
            vals = self.curve(coords, conf.sfc_bits)
            qs = np.linspace(0, 1, conf.num_partitions + 1)[1:-1]
            bounds = [float(b) for b in np.quantile(vals, qs, method="lower")]
            self.epochs[ep] = EpochState(lo.astype(np.float64), hi.astype(np.float64), bounds)
        return fresh

    # -- routing -------------------------------------------------------------

    def _pids_for(self, sk_row: np.ndarray, ep: int, replicate: int) -> set[int]:
        conf = self.conf
        st = self.epochs.get(ep)
        if st is None:
            # unlearned epoch: deterministic modulo fallback (the reference
            # routes by the latest curve until the epoch is summarized)
            return {int(abs(int(sk_row[0])) % conf.num_partitions)}
        side = 1 << conf.sfc_bits
        span = np.where((st.hi - st.lo) > 0, st.hi - st.lo, 1.0)
        coords = np.clip(((sk_row - st.lo) / span * side).astype(np.int64), 0, side - 1)
        v = int(self.curve(coords[None, :], conf.sfc_bits)[0])
        base = bisect.bisect_right(st.boundaries, float(v))
        pids: set[int] = set()
        for r in range(replicate):
            pids.add((base + r) % conf.num_partitions)
            pids.add((base - r) % conf.num_partitions)
        return pids

    def _assign_udf(self, fan_fresh_epochs: bool):
        part = self
        conf = self.conf
        interval, max_ttl = conf.update_interval, conf.max_ttl
        replicate = max(1, conf.replication_factor)

        @F.pandas_udf(ArrayType(IntegerType()))
        def assign(emb: pd.Series, et: pd.Series) -> pd.Series:
            if len(emb) == 0:
                return pd.Series([], dtype=object)
            mat = np.stack(emb.to_numpy()).astype(np.float64)
            sk = part._sketch(mat)
            out = []
            for i, t in enumerate(et):
                t = int(t)
                if fan_fresh_epochs:
                    # isFresh: epoch ep spans [ep*I, (ep+1)*I); prune epochs
                    # outside [t - max_ttl, t]
                    eps = [
                        ep
                        for ep in part.epochs
                        if (
                            max_ttl is None
                            or (ep + 1) * interval > t - max_ttl
                        )
                        and ep * interval <= t
                    ]
                else:
                    eps = [t // interval]
                pids: set[int] = set()
                for ep in eps:
                    pids |= part._pids_for(sk[i], ep, replicate)
                out.append(sorted(pids))
            return pd.Series(out)

        return assign

    def partition_data(self, df: DataFrame, emb_col: str = "emb") -> DataFrame:
        """Route each row by its OWN epoch's learned boundaries."""
        return _explode_pids(
            df,
            self._assign_udf(False)(F.col(emb_col), F.col("event_time")),
            with_fanout=False,
        )

    def partition_queries(self, df: DataFrame, emb_col: str = "emb") -> DataFrame:
        """Fan each query out to its partition in every FRESH epoch."""
        return _explode_pids(
            df,
            self._assign_udf(True)(F.col(emb_col), F.col("event_time")),
            with_fanout=True,
        )
