"""Segment-at-a-time vector search over a SegmentStore.

Reproduces the reference's SST search loop (``db/version_set.cc:2501-2740``)
in Spark terms:

  C6  TTL pruning        — skip segments whose event-time range can't satisfy
                           the freshness bound (store.prune)
  C7  hot-cold ordering  — segments visited hottest-first by a decayed
                           temperature score updated from contributed hits
                           (``util/metrics.h:77-109``)
  C4  per-segment search — a numpy HNSW built from the segment's rows,
                           cached per executor process keyed by segment id
                           (O7 block-cache analog; ``hnsw_table_reader.cc``)
  C8  early termination  — stop visiting more segments once enough have been
                           searched and the running kth distance is below an
                           EMA threshold (``version_set.cc:2643-2697``)
  M1  merge              — running top-k merge with (dist, id) tiebreak

The driver loop is sequential over segments by design — that IS the
reference's semantics (one SST at a time, terminate early). Each per-segment
search is a distributed Spark job over the query batch; executors read the
segment parquet directly (pyarrow) and keep the built index in a
process-global cache, so the vector data never flows through the driver.
The running M1 merge is DISTRIBUTED too: per-segment partials are
localCheckpointed DataFrames (lineage truncated, partitions pinned on
executors), unioned and cut to k via window functions; the driver holds only
DataFrame handles plus O(queries) termination statistics — strictly less
state than the reference's parallelism-1 reduce (``params.yaml:34``).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from vstream_spark.config import SearchOptions, VectorIndexConf
from vstream_spark.storage.segments import SegmentStore

# executor-process-global index cache: segment id -> HnswIndex (O7)
_INDEX_CACHE: dict[str, object] = {}
_INDEX_CACHE_MAX = 64


def _segment_index(seg: dict, conf: VectorIndexConf, metric: str):
    """Build-or-fetch the segment's index on this executor."""
    from vstream_spark.storage.segments import resolve_index_kind

    kind = resolve_index_kind(
        getattr(conf, "index_kind", "hnsw"), seg, conf.auto_ivf_threshold
    )
    key = f"{seg['id']}:{kind}:{metric}"
    idx = _INDEX_CACHE.get(key)
    if idx is None:
        import os

        from vstream_spark.index.hnsw import HnswIndex
        from vstream_spark.index.ivf import IvfIndex
        from vstream_spark.index.pq import PqIndex

        loader = {"ivf": IvfIndex, "pq": PqIndex}.get(kind, HnswIndex)
        sidecar = os.path.join(seg["path"], f"_{kind}-{metric}.idx")
        if not os.path.exists(sidecar) and kind == "hnsw":
            # legacy manifests recorded the hnsw artifact as index_file
            sidecar = seg.get("index_file") or sidecar
        if os.path.exists(sidecar):
            # C4: load the persisted artifact instead of rebuilding
            with open(sidecar, "rb") as f:
                idx = loader.loads(f.read())
        else:
            # cache-miss rebuild through the SAME pyarrow builder the
            # flush-time sidecar path uses (storage/segments.py) — one
            # audited implementation of codec dequantize + tombstone
            # shadowing instead of two drifting copies
            from vstream_spark.storage.segments import build_index_object

            _, idx = build_index_object(
                seg, kind, metric,
                m=conf.m, ef_construction=conf.ef_construction,
                nlist=conf.nlist, nprobe=conf.nprobe,
                auto_ivf_threshold=conf.auto_ivf_threshold,
                pq_m=conf.pq_m, pq_nbits=conf.pq_nbits,
            )
        if len(_INDEX_CACHE) >= _INDEX_CACHE_MAX:
            _INDEX_CACHE.pop(next(iter(_INDEX_CACHE)))
        _INDEX_CACHE[key] = idx
    return idx


class SegmentSearcher:
    """Top-k search across segments with pruning, temperature ordering and
    adaptive early termination."""

    def __init__(self, store: SegmentStore, conf: VectorIndexConf | None = None):
        self.store = store
        self.conf = conf or VectorIndexConf()
        # per-store EMA of the kth-distance termination threshold (C8)
        self.termination_threshold = self.conf.termination_threshold
        # segment id -> temperature (C7); decayed on every search
        self.temperature: dict[str, float] = {}

    # -- C7 ------------------------------------------------------------------

    def _order_segments(self, segs: list[dict]) -> list[dict]:
        return sorted(
            segs,
            key=lambda s: (-self.temperature.get(s["id"], 0.0), s["id"]),
        )

    def _update_temperature(self, seg_id: str, hits: int, decay: float = 0.8) -> None:
        old = self.temperature.get(seg_id, 0.0)
        self.temperature[seg_id] = decay * old + (1.0 - decay) * float(hits)

    # -- search --------------------------------------------------------------

    def search(
        self,
        queries: DataFrame,
        k: int = 10,
        metric: str = "l2",
        min_event_time: int | None = None,
        max_event_time: int | None = None,
        ef_search: int | None = None,
        options: "SearchOptions | None" = None,
    ) -> pd.DataFrame:
        """Returns a pandas frame (qid, neighbor_id, distance, rank).

        ``min_event_time`` is the freshness bound (query event_time - TTL);
        it prunes whole segments (C6) AND filters inside surviving indexes
        (the FilterSeqTs analog). ``options`` carries the per-query
        ``VectorSearchOptions`` toggles (``vector_options.h:79-95``):
        k/ef_search overrides, memtable-only search, temperature-ordering
        bypass, eviction-on-search, per-query termination_factor.
        """
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        conf = self.conf
        if options is not None:
            k = options.k if options.k is not None else k
            ef_search = (
                options.ef_search if options.ef_search is not None else ef_search
            )
            if options.is_evict and min_event_time is not None:
                self.store.evict(min_event_time)
        segs = self.store.prune(min_event_time, max_event_time)
        if options is not None and not options.search_sst:
            # memtable-only: the newest segment is the flush-most-recent
            # analog of the in-memory table
            segs = segs[-1:] if segs else segs
        if options is None or options.trigger_sort:
            segs = self._order_segments(segs)
        if not segs:
            return pd.DataFrame(
                {"qid": [], "neighbor_id": [], "distance": [], "rank": []}
            ).astype({"qid": "int64", "neighbor_id": "int64", "distance": "float64", "rank": "int32"})

        ef = max(ef_search or conf.ef_search, k)
        tombs = self._tombstones(min_event_time, max_event_time)
        w_lww = Window.partitionBy("qid", "neighbor_id").orderBy(
            F.col("neighbor_ts").desc()
        )
        w_rank = Window.partitionBy("qid").orderBy(
            F.col("distance").asc(), F.col("neighbor_id").asc()
        )
        merged: DataFrame | None = None
        searched = 0
        searched_ids: list[str] = []
        for seg in segs:
            # tag each hit with its segment of origin so temperature (C7)
            # derives from the final merged frame in the SAME materialization
            # instead of a per-segment count() job (r4 What's-wrong #3:
            # 2 jobs per segment -> S + O(1) jobs per search)
            part = self._search_one(
                seg, queries, k, metric, min_event_time, ef
            ).withColumn("_seg", F.lit(seg["id"]))
            # pin the partial on executors + truncate lineage: later rounds
            # must not re-run earlier segments' searches
            part = part.localCheckpoint(eager=True)
            if tombs is not None:
                # cross-segment deletes: drop hits whose id carries a delete
                # marker strictly newer than the hit's insert time
                part = (
                    part.join(
                        F.broadcast(tombs),
                        part["neighbor_id"] == tombs["id"],
                        "left",
                    )
                    .filter(
                        F.col("del_time").isNull()
                        | ~(F.col("del_time") > F.col("neighbor_ts"))
                    )
                    .drop("id", "del_time")
                )
            searched += 1
            searched_ids.append(seg["id"])
            cur = part if merged is None else merged.unionByName(part)
            # M1 running merge (distributed): duplicate ids across segments
            # resolve to the NEWEST version (last-writer-wins, the
            # memtable-over-SST precedence), then k best per qid with the
            # (dist, id) tiebreak
            cur = (
                cur.withColumn("_v", F.row_number().over(w_lww))
                .filter(F.col("_v") == 1)
                .withColumn("_r", F.row_number().over(w_rank))
                .filter(F.col("_r") <= k)
                .drop("_v", "_r")
            )
            merged = cur.localCheckpoint(eager=True)
            tf = (
                options.termination_factor
                if options is not None and options.termination_factor is not None
                else conf.termination_factor
            )
            if self._should_terminate(merged, k, searched, len(segs), tf):
                break

        # final materialization: O(queries x k) rows — the result itself
        out = merged.toPandas()
        # C8 EMA threshold update from this batch's kth distances
        kth = out.groupby("qid")["distance"].max() if len(out) else pd.Series([], dtype=float)
        if len(kth):
            w = conf.termination_weight
            self.termination_threshold = (
                (1.0 - w) * self.termination_threshold + w * float(kth.mean())
                if self.termination_threshold > 0.0
                else float(kth.mean())
            )
        # C7 temperature from the merged result: a segment's heat is the
        # number of its hits that SURVIVED the merge (segments that keep
        # winning the top-k stay hot; zero-contribution segments decay)
        seg_hits = (
            out.groupby("_seg").size().to_dict()
            if "_seg" in out.columns and len(out)
            else {}
        )
        for sid in searched_ids:
            self._update_temperature(sid, hits=int(seg_hits.get(sid, 0)))
        out = out.drop(columns=[c for c in ("neighbor_ts", "_seg") if c in out.columns])
        out = out.sort_values(["qid", "distance", "neighbor_id"], kind="stable").reset_index(drop=True)
        out["rank"] = out.groupby("qid").cumcount().astype("int32") + 1
        return out

    def _tombstones(
        self, min_event_time: int | None, max_event_time: int | None
    ) -> DataFrame | None:
        """Delete markers visible to this search: (id, del_time) as a SMALL
        DataFrame (reference deleteRatio 0.1) broadcast into the merge join;
        only markers at or before the snapshot bound apply — the
        tombstone-set analog of the version CF (C9). None when the store has
        no op column (pure-insert segments)."""
        df = self.store.read(min_event_time=None, max_event_time=max_event_time)
        if df is None or "op" not in df.columns:
            return None
        from pyspark.sql import functions as F

        return (
            df.filter(F.col("op") == "D")
            .groupBy("id")
            .agg(F.max("event_time").alias("del_time"))
        )

    def _should_terminate(
        self,
        merged: DataFrame,
        k: int,
        searched: int,
        total: int,
        termination_factor: float | None = None,
    ) -> bool:
        """version_set.cc:2643-2649: enough files searched AND the current
        kth distance is under factor x EMA threshold for every query. The
        check aggregates the (already tiny, checkpointed) merged frame down
        to O(queries) rows; only scalars reach the driver."""
        from pyspark.sql import functions as F

        if searched >= total:
            return False
        if searched <= self.conf.termination_lower_bound * total:
            return False
        if self.termination_threshold <= 0.0:
            return False
        row = merged.groupBy("qid").agg(
            F.count("*").alias("n"), F.max("distance").alias("kth")
        ).agg(
            F.min("n").alias("min_n"),
            F.count("*").alias("n_q"),
            F.max("kth").alias("max_kth"),
        ).collect()[0]
        if row["n_q"] == 0 or row["min_n"] < k:
            return False
        return bool(
            row["max_kth"]
            <= (
                termination_factor
                if termination_factor is not None
                else self.conf.termination_factor
            )
            * self.termination_threshold
        )

    def _search_one(
        self,
        seg: dict,
        queries: DataFrame,
        k: int,
        metric: str,
        min_ts: int | None,
        ef: int,
    ) -> DataFrame:
        conf = self.conf

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            idx = None
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                if idx is None:
                    idx = _segment_index(seg, conf, metric)
                qmat = np.stack(pdf["emb"].to_numpy()).astype(np.float64)
                qids, nids, dists, nts = [], [], [], []
                for j, (lbs, ds) in enumerate(
                    idx.search_batch(qmat, k, ef, min_ts)
                ):
                    qids.extend([int(pdf["qid"].iloc[j])] * len(lbs))
                    nids.extend(lbs)
                    dists.extend(ds)
                    nts.extend(idx.get_ts(int(lb)) for lb in lbs)
                yield pd.DataFrame(
                    {"qid": qids, "neighbor_id": nids, "distance": dists,
                     "neighbor_ts": nts}
                )

        # widen the query batch (narrow-probe guard): a query parquet scan
        # is 1-2 input splits, and mapInPandas inherits that width — the
        # whole per-query search loop would serialize onto 1-2 tasks while
        # every other core idles. widen() is identity once the batch is
        # already at full width, so iterated searches pay the tiny
        # round-robin exchange once per materialization of `queries`.
        from vstream_spark.operators.util import widen

        return widen(queries.select("qid", "emb")).mapInPandas(
            run, "qid long, neighbor_id long, distance double, neighbor_ts long"
        )
