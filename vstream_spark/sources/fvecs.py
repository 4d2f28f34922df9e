"""SIFT-format binary vector file decoders (fvecs/bvecs/ivecs).

Spark-first re-expression of the reference's HDFS binary sources
(``FloatVectorBinaryInputFormat.java:25-130``: records are
``[dim int32 LE][payload dim x {float32|uint8}]``; bvecs uint8 payloads are
widened to float32 at read time, ``FloatVectorBinaryInputFormat.java:74-82``).

Distributed path: ``spark.read.format("binaryFile")`` brings whole files as
binary content; decode happens executor-side in ``mapInPandas`` with numpy
``frombuffer`` (Arrow-batched, no per-row Python). Files are the unit of
parallelism — for many-file datasets (the common layout for 100 TB) this
scales linearly; a single giant file should be pre-split or pre-converted to
Parquet (the engine's preferred storage).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_SCHEMAS = {
    "fvecs": ("id BIGINT, emb ARRAY<FLOAT>", np.float32, 4),
    "bvecs": ("id BIGINT, emb ARRAY<FLOAT>", np.uint8, 1),
    "ivecs": ("id BIGINT, neighbors ARRAY<INT>", np.int32, 4),
}


def _decode_file(content: bytes, elem_dtype, elem_size: int, limit: int | None, skip: int):
    """Yield (index, vector) from one xvecs byte buffer."""
    out_ids, out_vecs = [], []
    offset = 0
    idx = 0
    n = len(content)
    while offset + 4 <= n:
        dim = int(np.frombuffer(content, dtype="<i4", count=1, offset=offset)[0])
        rec_bytes = 4 + dim * elem_size
        if offset + rec_bytes > n:
            break
        if idx >= skip and (limit is None or len(out_ids) < limit):
            vec = np.frombuffer(content, dtype=elem_dtype, count=dim, offset=offset + 4)
            out_ids.append(idx - skip)
            out_vecs.append(vec)
        offset += rec_bytes
        idx += 1
        if limit is not None and len(out_ids) >= limit:
            break
    return out_ids, out_vecs


def _reader(kind: str, limit: int | None, skip: int):
    schema, elem_dtype, elem_size = _SCHEMAS[kind]
    cast_dtype = np.float32 if kind in ("fvecs", "bvecs") else np.int32

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        col = "emb" if kind in ("fvecs", "bvecs") else "neighbors"
        for pdf in batches:
            for content in pdf["content"]:
                ids, vecs = _decode_file(bytes(content), elem_dtype, elem_size, limit, skip)
                yield pd.DataFrame(
                    {"id": ids, col: [v.astype(cast_dtype) for v in vecs]}
                )

    return schema, decode


def _read_xvecs(
    spark: SparkSession, path: str, kind: str, limit: int | None, skip: int
) -> DataFrame:
    schema, decode = _reader(kind, limit, skip)
    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(decode, schema=schema)


def read_fvecs(spark, path, limit=None, skip=0):
    """float32 vectors -> DataFrame(id BIGINT, emb ARRAY<FLOAT>)."""
    return _read_xvecs(spark, path, "fvecs", limit, skip)


def read_bvecs(spark, path, limit=None, skip=0):
    """uint8 vectors widened to float32 (reference FileType.B_VEC)."""
    return _read_xvecs(spark, path, "bvecs", limit, skip)


def read_ivecs(spark, path, limit=None, skip=0):
    """int32 ground-truth lists -> DataFrame(id BIGINT, neighbors ARRAY<INT>)."""
    return _read_xvecs(spark, path, "ivecs", limit, skip)
