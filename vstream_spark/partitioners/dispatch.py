"""Partitioner dispatch: conf.kind -> fitted exchange operator.

Mirrors the reference's factory ``PartitionFunction.getPartitionFunction``
(``partitioner/PartitionFunction.java:82-218``). Kinds:

  simple         P1  hash(id) mod P; queries broadcast to ALL partitions
  lsh            P2  p-stable LSH, k1 families x k2 hashes
  lsh+random     P3  lsh + ~P/3 extra random partitions on the query side
  lsh+proximity  P4  lsh + multiprobe perturbation fan-out
  lsh+hilbert / lsh+zorder / lsh+gray / lsh+peano / lsh+sierpinski
                 P5  LSH sketch -> space-filling-curve value -> equi-depth
                     quantile partition boundaries re-learned per event-time
                     epoch; queries fan out to every fresh epoch's partition
  hilbert        P9  curve on the raw vector (no LSH), ring replication
  kmeans         P7  pyspark.ml KMeans; route to replication_factor nearest
                     centroids
  odyssey        P8  SAX-word replication groups; hot-word skew relief;
                     queries visit one member per group (exact)

Contract: ``fit_partitioner(conf, vectors)`` returns a ``FittedPartitioner``
with ``partition_data(df)`` (adds ``partition_id``, possibly replicating rows)
and ``partition_queries(df)`` (adds ``partition_id`` fan-out +
``num_partitions_sent`` for merge completeness, ``PartitionedQuery.java:7-28``).

Learned state (quantile boundaries, centroids) is always a SMALL broadcastable
object collected once on the driver — O(P) floats per epoch / O(C*dim)
centroids — never the data itself (100 TB posture, SURVEY §7).
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
from vstream_spark.partitioners.lsh import LSHFamilies

_FAMILY_CACHE: dict[tuple, LSHFamilies] = {}

# Fitted-partitioner state cache (r14 VERDICT #4). A KMeans fit is ~25
# driver-scheduled jobs (k-means|| init + Lloyd iterations) whose output is a
# tiny deterministic array of centroids — re-fitting it on every query call
# re-pays job-scheduling fixed cost for byte-identical state. Same discipline
# as the sources.tables plan cache: keyed by (applicationId, canonicalized
# plan semantic hash, input files + mtime_ns + size, fit parameters), so a
# session restart, a different projection, or a rewritten file can never hit
# a stale entry. The first fit of a session still runs inside whatever timed
# region called it (nothing is precomputed across bench runs — the bench
# restarts sessions, which rotates the applicationId and empties the cache);
# values are the learned PARAMETERS of the dataflow (like a memoized plan),
# never query results.
_FIT_CACHE: dict[tuple, object] = {}


def _fit_input_key(df: DataFrame, *params) -> tuple | None:
    """Session-scoped identity of a fit input, or None when one cannot be
    derived soundly (non-file sources): callers skip caching on None."""
    import os

    try:
        app_id = df.sparkSession.sparkContext.applicationId
        sem = df._jdf.queryExecution().analyzed().semanticHash()
        files = sorted(df.inputFiles())
        if not files:
            return None
        stats = []
        for f in files:
            p = f
            if p.startswith("file:"):
                from urllib.parse import urlparse

                p = urlparse(p).path
            st = os.stat(p)
            stats.append((p, st.st_mtime_ns, st.st_size))
        return (app_id, sem, tuple(stats), *params)
    except Exception:  # noqa: BLE001 - cache miss is always safe
        return None


def _families(dim: int, conf: PartitionerConf) -> LSHFamilies:
    key = (dim, conf)
    if key not in _FAMILY_CACHE:
        _FAMILY_CACHE[key] = LSHFamilies(dim, conf)
    return _FAMILY_CACHE[key]


def _explode_pids(df: DataFrame, pids_col, with_fanout: bool) -> DataFrame:
    out = df.withColumn("_pids", pids_col)
    if with_fanout:
        out = out.withColumn("num_partitions_sent", F.size("_pids"))
    return out.withColumn("partition_id", F.explode("_pids")).drop("_pids")


class FittedPartitioner:
    def __init__(self, conf: PartitionerConf):
        self.conf = conf

    def partition_data(self, df: DataFrame, emb_col: str = "emb") -> DataFrame:
        raise NotImplementedError

    def partition_queries(self, df: DataFrame, emb_col: str = "emb") -> DataFrame:
        raise NotImplementedError

    @property
    def merge_needs_dedup(self) -> bool:
        """True when ``partition_data`` may route one row to more than one
        partition, so a downstream merge can see duplicate (qid, id)
        candidates and must eliminate them (M1, ``SearchResult.combine:
        156-165``). Partitioners that assign each row exactly one partition
        return False, letting the merge skip a full sort+exchange over the
        candidate set — at sf1 that window was the dominant cost of the
        exact partitioned path (Q x N rows shuffled twice). Conservative
        default: True."""
        return True


class SimplePartitioner(FittedPartitioner):
    """P1 (SimplePartitionFunction.java:217-271): id-hash routing, full query
    broadcast — the exact-search exchange (no pruning, recall 1.0)."""

    merge_needs_dedup = False  # id-hash: exactly one partition per row

    def partition_data(self, df: DataFrame, emb_col: str = "emb") -> DataFrame:
        p = self.conf.num_partitions
        return df.withColumn("partition_id", F.pmod(F.hash("id"), F.lit(p)).cast("int"))

    def partition_queries(self, df: DataFrame, emb_col: str = "emb") -> DataFrame:
        p = self.conf.num_partitions
        return _explode_pids(
            df, F.sequence(F.lit(0), F.lit(p - 1)), with_fanout=True
        )


class LSHPartitioner(FittedPartitioner):
    """P2/P3/P4: stateless seeded LSH routing (same families both sides)."""

    def __init__(self, conf: PartitionerConf, query_probes: int = 0, random_extra: bool = False):
        super().__init__(conf)
        self.query_probes = query_probes
        self.random_extra = random_extra

    def _pids_udf(self, probes: int):
        conf = self.conf

        @F.pandas_udf(ArrayType(IntegerType()))
        def pids(emb: pd.Series) -> pd.Series:
            if len(emb) == 0:
                return pd.Series([], dtype=object)
            mat = np.stack(emb.to_numpy()).astype(np.float64)
            fams = _families(mat.shape[1], conf)
            sets = fams.partitions(mat, probes)
            return pd.Series([sorted(s) for s in sets])

        return pids

    @property
    def merge_needs_dedup(self) -> bool:
        # one partition per hash family; k1 = 1 assigns each row exactly once
        return self.conf.num_families > 1

    def partition_data(self, df: DataFrame, emb_col: str = "emb") -> DataFrame:
        return _explode_pids(df, self._pids_udf(0)(F.col(emb_col)), with_fanout=False)

    def partition_queries(self, df: DataFrame, emb_col: str = "emb") -> DataFrame:
        pids = self._pids_udf(self.query_probes)(F.col(emb_col))
        if self.random_extra:
            # P3: +floor(P/3) pseudo-random extra partitions, seeded by qid
            # (LSHAndRandomPartitionFunction.java:253-350)
            extra = F.array(
                *[
                    F.pmod(F.hash(F.col("qid") + F.lit(i * 7919)), F.lit(self.conf.num_partitions)).cast("int")
                    for i in range(max(1, self.conf.num_partitions // 3))
                ]
            )
            pids = F.array_distinct(F.concat(pids, extra))
        return _explode_pids(df, pids, with_fanout=True)


class CurvePartitioner(FittedPartitioner):
    """P5/P9: (optional LSH sketch ->) space-filling curve -> equi-depth
    quantile boundaries, re-learned per event-time epoch.

    Batch analog of ``LSHashSpaceFillingPartitioner.java:12-356``: boundaries
    are learned with ``percentile_approx`` per epoch (``summarizeHistory``,
    :118-145 — equi-depth quantiles over a bounded history); data is routed by
    its own epoch's boundaries (``getDataPartition``:266-312); queries fan out
    to their partition in EVERY epoch (``getQueryPartition``:314-351 — all
    epochs of a batch table are "fresh" unless an event-time filter already
    pruned them).
    """

    def __init__(self, conf: PartitionerConf, curve: str, use_lsh: bool):
        super().__init__(conf)
        if use_lsh and conf.num_hashes * conf.sfc_bits > 62:
            raise ValueError("num_hashes * sfc_bits must be <= 62 (int64 curve index)")
        self.curve = CURVES[curve]
        self.use_lsh = use_lsh
        # P9 (raw-vector curve, SpaceFillingPartitionFunction.java:17-205) on
        # high-dim vectors: keep the curve index in int64 by truncating to the
        # leading dims that fit sfc_bits each (the reference's own precedent
        # for dimension truncation: NKMeans distance uses only the first 10
        # dims, NKMeans.java:181-189). Locality of a 7-bit/dim curve over 64
        # dims is noise beyond the leading dims anyway.
        self.max_dims = max(1, 62 // conf.sfc_bits)
        self.boundaries: dict[int, list[float]] = {}  # epoch -> P-1 boundaries
        self.lo: np.ndarray | None = None  # sketch-space normalization
        self.hi: np.ndarray | None = None

    def _curve_udf(self):
        conf, curve, use_lsh = self.conf, self.curve, self.use_lsh
        lo, hi = self.lo, self.hi
        max_dims = self.max_dims

        @F.pandas_udf("long")
        def curve_value(emb: pd.Series) -> pd.Series:
            if len(emb) == 0:
                return pd.Series([], dtype="int64")
            mat = np.stack(emb.to_numpy()).astype(np.float64)
            sketch = (
                _families(mat.shape[1], conf).hash_values(mat, 0)
                if use_lsh
                else mat[:, :max_dims]
            )
            side = 1 << conf.sfc_bits
            span = np.where((hi - lo) > 0, hi - lo, 1.0)
            coords = np.clip(
                ((sketch - lo) / span * side).astype(np.int64), 0, side - 1
            )
            vals = curve(coords, conf.sfc_bits)
            return pd.Series([int(v) for v in vals], dtype="int64")

        return curve_value

    def fit(self, vectors: DataFrame, emb_col: str = "emb") -> "CurvePartitioner":
        conf = self.conf
        has_time = "event_time" in vectors.columns

        # Pass 1: normalization range of the sketch space (driver gets 2 small
        # arrays). Sample-based — bounded work regardless of table size.
        sample = vectors.select(emb_col).limit(100_000)
        pdf = sample.toPandas()
        mat = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
        sketch = (
            _families(mat.shape[1], conf).hash_values(mat, 0)
            if self.use_lsh
            else mat[:, : self.max_dims]
        )
        self.lo = sketch.min(axis=0).astype(np.float64)
        self.hi = sketch.max(axis=0).astype(np.float64)

        # Pass 2: per-epoch equi-depth boundaries via percentile_approx
        # (distributed sketch; driver receives O(epochs * P) floats).
        qs = [i / conf.num_partitions for i in range(1, conf.num_partitions)]
        cv = vectors.withColumn("_cv", self._curve_udf()(F.col(emb_col)))
        epoch_col = (
            (F.col("event_time") / F.lit(conf.update_interval)).cast("long")
            if has_time
            else F.lit(0)
        )
        rows = (
            cv.withColumn("_epoch", epoch_col)
            .groupBy("_epoch")
            .agg(F.percentile_approx("_cv", qs, 10_000).alias("_bounds"))
            .collect()
        )
        self.boundaries = {int(r["_epoch"]): [float(b) for b in r["_bounds"]] for r in rows}
        return self

    def _assign_udf(self, fan_all_epochs: bool, replicate: int):
        boundaries = self.boundaries
        conf = self.conf
        interval, max_ttl = conf.update_interval, conf.max_ttl

        @F.pandas_udf(ArrayType(IntegerType()))
        def assign(cv: pd.Series, epoch: pd.Series, et: pd.Series) -> pd.Series:
            out = []
            for v, e, t in zip(cv, epoch, et):
                if fan_all_epochs:
                    # isFresh epoch pruning: epoch ep spans
                    # [ep*interval, (ep+1)*interval); visible data lies in
                    # [t - max_ttl, t], so stale/future epochs are skipped
                    epochs = [
                        ep
                        for ep in boundaries
                        if max_ttl is None
                        or t is None
                        or pd.isna(t)
                        or ((ep + 1) * interval > int(t) - max_ttl and ep * interval <= int(t))
                    ]
                else:
                    epochs = [int(e)]
                pids: set[int] = set()
                for ep in epochs:
                    b = boundaries.get(int(ep))
                    if b is None:
                        pids.add(int(v) % conf.num_partitions)
                        continue
                    base = bisect.bisect_right(b, float(v))
                    for r in range(replicate):
                        pids.add((base + r) % conf.num_partitions)
                        pids.add((base - r) % conf.num_partitions)
                out.append(sorted(pids))
            return pd.Series(out)

        return assign

    def _with_epoch(self, df: DataFrame) -> DataFrame:
        if "event_time" in df.columns:
            ep = (F.col("event_time") / F.lit(self.conf.update_interval)).cast("long")
        else:
            ep = F.lit(0).cast("long")
        return df.withColumn("_epoch", ep)

    @staticmethod
    def _event_time_col(df: DataFrame):
        return (
            F.col("event_time").cast("long")
            if "event_time" in df.columns
            else F.lit(None).cast("long")
        )

    @property
    def merge_needs_dedup(self) -> bool:
        # data rows stay inside their own epoch; ring replication only
        # duplicates them when replication_factor > 1
        return max(1, self.conf.replication_factor) > 1

    def partition_data(self, df: DataFrame, emb_col: str = "emb") -> DataFrame:
        cv = self._with_epoch(df.withColumn("_cv", self._curve_udf()(F.col(emb_col))))
        out = _explode_pids(
            cv,
            self._assign_udf(False, max(1, self.conf.replication_factor))(
                F.col("_cv"), F.col("_epoch"), self._event_time_col(df)
            ),
            with_fanout=False,
        )
        return out.drop("_cv", "_epoch")

    def partition_queries(self, df: DataFrame, emb_col: str = "emb") -> DataFrame:
        cv = self._with_epoch(df.withColumn("_cv", self._curve_udf()(F.col(emb_col))))
        out = _explode_pids(
            cv,
            self._assign_udf(True, max(1, self.conf.replication_factor))(
                F.col("_cv"), F.col("_epoch"), self._event_time_col(df)
            ),
            with_fanout=True,
        )
        return out.drop("_cv", "_epoch")


class KMeansPartitioner(FittedPartitioner):
    """P7 (KMeansPartitionFunction.java:21-125): route vector/query to the
    replication_factor nearest centroids. Centroids fit with pyspark.ml on a
    bounded sample (maxHistorySize analog), broadcast as a small numpy array."""

    def __init__(self, conf: PartitionerConf):
        super().__init__(conf)
        self.centroids: np.ndarray | None = None

    def fit(self, vectors: DataFrame, emb_col: str = "emb") -> "KMeansPartitioner":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        # within-session memo of the fitted centroids (see _FIT_CACHE): the
        # pyspark.ml fit is ~25 driver jobs for a deterministic (seeded)
        # result — it dominated knn_ivf_ann's wall time at rehearsal SFs
        key = _fit_input_key(
            vectors, "kmeans", emb_col, self.conf.num_partitions, self.conf.seed
        )
        if key is not None and key in _FIT_CACHE:
            self.centroids = _FIT_CACHE[key]
            return self
        sample = vectors.select(array_to_vector(F.col(emb_col)).alias("features")).limit(
            100_000
        )
        model = KMeans(
            k=self.conf.num_partitions, seed=self.conf.seed, maxIter=20
        ).fit(sample)
        self.centroids = np.stack([np.asarray(c) for c in model.clusterCenters()])
        if key is not None:
            _FIT_CACHE[key] = self.centroids
        return self

    def _assign_udf(self, topr: int):
        centroids = self.centroids

        @F.pandas_udf(ArrayType(IntegerType()))
        def assign(emb: pd.Series) -> pd.Series:
            if len(emb) == 0:
                return pd.Series([], dtype=object)
            mat = np.stack(emb.to_numpy()).astype(np.float64)
            d = ((mat[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
            order = np.argsort(d, axis=1)[:, :topr]
            return pd.Series([sorted(int(p) for p in row) for row in order])

        return assign

    @property
    def merge_needs_dedup(self) -> bool:
        return max(1, self.conf.replication_factor) > 1

    def partition_data(self, df: DataFrame, emb_col: str = "emb") -> DataFrame:
        r = max(1, self.conf.replication_factor)
        return _explode_pids(df, self._assign_udf(r)(F.col(emb_col)), with_fanout=False)

    def partition_queries(self, df: DataFrame, emb_col: str = "emb") -> DataFrame:
        # queries probe query_fanout nearest cells (IVF nprobe); data-side
        # replication stays at replication_factor
        qf = self.conf.query_fanout
        r = max(1, qf if qf is not None else self.conf.replication_factor)
        return _explode_pids(df, self._assign_udf(r)(F.col(emb_col)), with_fanout=True)


class OdysseyPartitioner(FittedPartitioner):
    """P8 (OdysseyPartitionFunction.java:160-329): SAX-word replication
    groups. Data goes to its word's group, replicated to every member; hot
    words (HotTracer top-λ) spread across groups by record id; queries visit
    one deterministic member per group — complete coverage, EXACT results,
    query load spread over replicas."""

    def __init__(self, conf: PartitionerConf):
        super().__init__(conf)
        if conf.num_partitions % max(1, conf.replication_factor):
            raise ValueError("num_partitions must be divisible by replication_factor")
        self.num_groups = conf.num_partitions // max(1, conf.replication_factor)
        self.hot_words: frozenset[int] = frozenset()

    def fit(self, vectors: DataFrame, emb_col: str = "emb") -> "OdysseyPartitioner":
        """Batch analog of HotTracer's sliding window: top-λ words by count,
        collected as a tiny broadcastable set (O(λ) driver state)."""
        from vstream_spark.partitioners.sax import sax_words

        conf = self.conf

        @F.pandas_udf("long")
        def word_udf(emb: pd.Series) -> pd.Series:
            if len(emb) == 0:
                return pd.Series([], dtype="int64")
            mat = np.stack(emb.to_numpy()).astype(np.float64)
            return pd.Series(sax_words(mat, conf.sax_word_len, conf.sax_alphabet))

        self._word_udf = word_udf
        # same within-session memo as the kmeans fit: the hot-word top-λ is a
        # deterministic (count desc, word asc) aggregate — one job per call
        key = _fit_input_key(
            vectors, "odyssey", emb_col, conf.sax_word_len,
            conf.sax_alphabet, conf.hot_tracker_size,
        )
        if key is not None and key in _FIT_CACHE:
            self.hot_words = _FIT_CACHE[key]
            return self
        rows = (
            vectors.select(word_udf(F.col(emb_col)).alias("_w"))
            .groupBy("_w")
            .count()
            .orderBy(F.col("count").desc(), F.col("_w").asc())
            .limit(conf.hot_tracker_size)
            .collect()
        )
        self.hot_words = frozenset(int(r["_w"]) for r in rows)
        if key is not None:
            _FIT_CACHE[key] = self.hot_words
        return self

    def _data_pids_udf(self):
        from vstream_spark.partitioners.sax import group_of_word, sax_words

        conf, ngroups, rf = self.conf, self.num_groups, max(1, self.conf.replication_factor)
        hot = self.hot_words

        @F.pandas_udf(ArrayType(IntegerType()))
        def pids(ids: pd.Series, emb: pd.Series) -> pd.Series:
            if len(emb) == 0:
                return pd.Series([], dtype=object)
            mat = np.stack(emb.to_numpy()).astype(np.float64)
            words = sax_words(mat, conf.sax_word_len, conf.sax_alphabet)
            groups = group_of_word(words, ngroups, conf.seed)
            if hot:
                is_hot = np.isin(words, np.fromiter(hot, dtype=np.int64))
                # hot words: per-record pseudo-random group (skew relief);
                # still replicated to the whole group => queries stay complete
                rec = group_of_word(ids.to_numpy().astype(np.int64), ngroups, conf.seed + 1)
                groups = np.where(is_hot, rec, groups)
            return pd.Series([[int(g * rf + r) for r in range(rf)] for g in groups])

        return pids

    def _query_pids_udf(self):
        from vstream_spark.partitioners.sax import group_of_word

        conf, ngroups, rf = self.conf, self.num_groups, max(1, self.conf.replication_factor)

        @F.pandas_udf(ArrayType(IntegerType()))
        def pids(qids: pd.Series) -> pd.Series:
            if len(qids) == 0:
                return pd.Series([], dtype=object)
            q = qids.to_numpy().astype(np.int64)
            out = []
            for qid in q:
                # one deterministic member per group (round-robin analog)
                members = group_of_word(
                    np.full(ngroups, qid, dtype=np.int64) + np.arange(ngroups),
                    rf,
                    conf.seed + 2,
                )
                out.append(sorted(int(g * rf + m) for g, m in enumerate(members)))
            return pd.Series(out)

        return pids

    # data IS replicated (rf copies inside its group), but each query visits
    # exactly ONE member per group, so a (query, row) pair meets at most once
    # — the merge never sees duplicate candidates
    merge_needs_dedup = False

    def partition_data(self, df: DataFrame, emb_col: str = "emb") -> DataFrame:
        return _explode_pids(
            df, self._data_pids_udf()(F.col("id"), F.col(emb_col)), with_fanout=False
        )

    def partition_queries(self, df: DataFrame, emb_col: str = "emb") -> DataFrame:
        return _explode_pids(df, self._query_pids_udf()(F.col("qid")), with_fanout=True)


def fit_partitioner(conf: PartitionerConf, vectors: DataFrame | None = None) -> FittedPartitioner:
    kind = conf.kind
    if kind == "simple":
        return SimplePartitioner(conf)
    if kind == "lsh":
        return LSHPartitioner(conf)
    if kind == "lsh+random":
        return LSHPartitioner(conf, random_extra=True)
    if kind == "lsh+proximity":
        return LSHPartitioner(conf, query_probes=max(1, conf.num_probes))
    if kind.startswith("lsh+") and kind.split("+", 1)[1] in CURVES:
        part = CurvePartitioner(conf, kind.split("+", 1)[1], use_lsh=True)
        if vectors is None:
            raise ValueError(f"{kind} requires vectors to fit quantile boundaries")
        return part.fit(vectors)
    if kind == "hilbert":
        part = CurvePartitioner(conf, "hilbert", use_lsh=False)
        if vectors is None:
            raise ValueError("hilbert requires vectors to fit quantile boundaries")
        return part.fit(vectors)
    if kind == "kmeans":
        if vectors is None:
            raise ValueError("kmeans requires vectors to fit centroids")
        return KMeansPartitioner(conf).fit(vectors)
    if kind == "odyssey":
        part = OdysseyPartitioner(conf)
        return part.fit(vectors) if vectors is not None else part
    raise ValueError(f"unknown partitioner kind {kind!r}")


def partition_data(df: DataFrame, conf: PartitionerConf, emb_col: str = "emb") -> DataFrame:
    """Stateless convenience for simple/lsh kinds (no fitting needed)."""
    return fit_partitioner(conf, df).partition_data(df, emb_col)


def partition_queries(df: DataFrame, conf: PartitionerConf, emb_col: str = "emb") -> DataFrame:
    return fit_partitioner(conf).partition_queries(df, emb_col)


def partition_balance(pdata: DataFrame) -> DataFrame:
    """Balance diagnostics for a partitioned stream (the reference logs the
    same stats per epoch, LSHWithSpaceFillingPartitionFunction.java:366-374):
    per-partition row count and its ratio to the mean."""
    counts = pdata.groupBy("partition_id").count()
    total = counts.agg(
        F.sum("count").alias("_t"), F.count("*").alias("_p")
    ).collect()[0]
    mean = total["_t"] / max(1, total["_p"])
    return counts.select(
        "partition_id",
        F.col("count").alias("n"),
        (F.col("count") / F.lit(float(mean))).alias("ratio_to_mean"),
    )


def balance_factor(pdata: DataFrame) -> float:
    """max/mean partition size — 1.0 is perfectly balanced."""
    row = partition_balance(pdata).agg(F.max("ratio_to_mean")).collect()[0]
    return float(row[0]) if row[0] is not None else 0.0
