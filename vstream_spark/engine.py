"""VStreamEngine — the one-object API surface of the engine.

The reference is driven by a single YAML (``util/Parameters.java``) wired
into one job (``VStreamSearchJob``). The Spark-native equivalent: construct
an engine from ``EngineConf`` and get every execution mode from it —

    engine = VStreamEngine(spark, EngineConf(...))
    engine.search(vectors, queries)            # batch: exchange+worker+merge
    engine.search_exact(vectors, queries)      # brute-force oracle path
    store = engine.open_store("/data/segs")    # LSM-analog persistence
    engine.searcher(store).search(queries)     # segment loop (C6/C7/C8)
    engine.stateful_stream(element_stream)     # streaming keyed-state search

Every method returns ordinary DataFrames (or pandas for the segment loop),
so the whole Spark SQL surface composes around the engine's operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from vstream_spark.config import EngineConf


class VStreamEngine:
    def __init__(self, spark: SparkSession, conf: EngineConf | None = None):
        self.spark = spark
        self.conf = conf or EngineConf()

    # -- batch ----------------------------------------------------------------

    def search_exact(
        self, vectors: DataFrame, queries: DataFrame, k: int | None = None
    ) -> DataFrame:
        """Brute-force exact kNN (the recall oracle; W3+M1 semantics)."""
        from vstream_spark.operators.knn import knn_exact

        return knn_exact(
            vectors, queries, k=k or self.conf.index.k, metric=self.conf.index.metric
        )

    def search(
        self,
        vectors: DataFrame,
        queries: DataFrame,
        k: int | None = None,
        use_index: bool = True,
    ) -> DataFrame:
        """The reference dataflow: partition both sides with the configured
        exchange operator, search per-partition (HNSW when ``use_index``),
        merge to global top-k."""
        from vstream_spark.operators.partitioned import knn_partitioned_worker

        return knn_partitioned_worker(
            vectors,
            queries,
            self.conf.partitioner,
            k=k or self.conf.index.k,
            metric=self.conf.index.metric,
            index_conf=self.conf.index if use_index else None,
        )

    def dedupe(self, vectors: DataFrame, threshold: float = 0.9) -> DataFrame:
        """Embedding near-dup marking over a vector collection."""
        from vstream_spark.operators.dedup import dedup_embedding

        return dedup_embedding(vectors, threshold, id_col="id", emb_col="emb")

    # -- storage --------------------------------------------------------------

    def open_store(self, base_dir: str, validate_dim: bool = False):
        """``validate_dim=True`` enforces ``conf.index.dim`` on every flush
        (§1.3: dimension is config, never inferred)."""
        from vstream_spark.storage.segments import SegmentStore

        return SegmentStore(
            self.spark,
            base_dir,
            dim=self.conf.index.dim if validate_dim else None,
        )

    def erase(self, store, predicate, event_time: int | None = None):
        """Bulk logical erasure on a store (delete_where passthrough).
        ``event_time=None`` lets the store pick a guaranteed-winning LWW
        timestamp (max victim insert time + 1); a supplied stale timestamp
        raises instead of silently leaving rows visible."""
        return store.delete_where(predicate, event_time=event_time)

    def pin_version(self, store) -> int:
        """Current manifest version — the token for snapshot (as_of) reads."""
        return store.manifest.version()

    def searcher(self, store, restore_state: bool = False):
        """``restore_state=True`` reloads persisted C7 temperature + C8
        termination EMA from the store's sidecar (util/metrics.h:77-109
        analog) so a restarted deployment searches warm, not cold; pair
        with ``searcher.save_state()`` at shutdown/checkpoint."""
        from vstream_spark.storage.search import SegmentSearcher

        return SegmentSearcher(store, self.conf.index, restore_state=restore_state)

    # -- streaming ------------------------------------------------------------

    def ingest_stream(self, store, vectors_stream: DataFrame, checkpoint_dir: str):
        """Micro-batch = segment ingestion (the default 100 TB path)."""
        from vstream_spark.streaming.pipeline import StreamingVectorIngest

        return StreamingVectorIngest(store).start(vectors_stream, checkpoint_dir)

    def stateful_stream(
        self, element_stream: DataFrame, k: int | None = None
    ) -> DataFrame:
        """Keyed-state streaming search over a mixed I/D/Q element stream
        (the in-memory low-latency mode)."""
        from vstream_spark.streaming.stateful import stateful_vector_search

        return stateful_vector_search(
            element_stream,
            self.conf.index,
            k=k or self.conf.index.k,
            metric=self.conf.index.metric,
        )
