"""Stateful streaming vector search — the reference's core dataflow as one
Structured Streaming operator.

``VStreamSearchJob`` (SURVEY §3.1) keys a mixed insert/delete/query stream by
``partition_id`` and holds a mutable per-partition HNSW index in keyed state
(``RocksDBKeyedProcessFunction.processElement:149-180`` dispatching on
element type). The Spark-native equivalent is
``groupBy(partition_id).applyInPandasWithState``: state = the serialized
numpy HNSW graph; each micro-batch applies inserts (W1), tombstones deletes
(W2), then answers the batch's queries against the updated graph (W3) with
the freshness filter.

This is the in-state-graph alternative to the segment-append path
(``streaming/pipeline.py`` + ``storage/search.py``). SURVEY §7 flags state
size as the trade-off: per-partition graphs must fit the state store, so the
segment path remains the default at 100 TB scale; this operator is the
low-latency small-state variant (the reference's in-memory hnswlib mode,
``HnswLibKeyedProcessFunction.java:19-101``).

Input schema (one unified stream, PartitionedElement analog):
  partition_id INT, op STRING ('I'/'D'/'Q'), id BIGINT, emb ARRAY<FLOAT>,
  event_time BIGINT, ttl BIGINT
Output: qid BIGINT, neighbor_id BIGINT, distance DOUBLE, partition_id INT
(per-partition partials — compose with ``operators.knn.topk`` for the global
M1 merge).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from vstream_spark.config import VectorIndexConf

OUTPUT_SCHEMA = (
    "qid BIGINT, neighbor_id BIGINT, distance DOUBLE, partition_id INT"
)
STATE_SCHEMA = "graph BINARY"


def stateful_search_fn(conf: VectorIndexConf, k: int, metric: str = "l2"):
    """Build the (key, batches, state) -> batches function for
    applyInPandasWithState."""

    def fn(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        from vstream_spark.index.hnsw import HnswIndex

        (pid,) = key
        if state.exists:
            (blob,) = state.get
            idx = HnswIndex.loads(bytes(blob))
        else:
            idx = HnswIndex(
                conf.dim, metric, conf.m, conf.ef_construction, seed=42
            )
        out = []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # deterministic replay order: event_time, then id (task retries
            # of the same micro-batch rebuild identical state)
            pdf = pdf.sort_values(["event_time", "id"], kind="stable")
            ins = pdf[pdf["op"] == "I"]
            for _id, emb, et in zip(ins["id"], ins["emb"], ins["event_time"]):
                idx.add_point(np.asarray(emb, dtype=np.float32), int(_id), int(et))
            for _id in pdf[pdf["op"] == "D"]["id"]:
                idx.mark_delete(int(_id))
            qs = pdf[pdf["op"] == "Q"]
            for qid, emb, et, ttl in zip(
                qs["id"], qs["emb"], qs["event_time"], qs["ttl"]
            ):
                min_ts = int(et) - int(ttl) if ttl is not None else None
                lbs, ds = idx.search(
                    np.asarray(emb, dtype=np.float64), k,
                    max(conf.ef_search, k), min_ts,
                )
                if len(lbs):
                    out.append(
                        pd.DataFrame(
                            {
                                "qid": int(qid),
                                "neighbor_id": lbs,
                                "distance": ds,
                                "partition_id": int(pid),
                            }
                        )
                    )
        state.update((idx.dumps(),))
        if out:
            yield pd.concat(out)

    return fn


def stateful_vector_search(
    stream: DataFrame,
    conf: VectorIndexConf,
    k: int = 10,
    metric: str = "l2",
) -> DataFrame:
    """Wire the stateful worker over a partitioned element stream."""
    return stream.groupBy("partition_id").applyInPandasWithState(
        stateful_search_fn(conf, k, metric),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
