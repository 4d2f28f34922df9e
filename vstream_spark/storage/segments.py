"""Segmented vector storage — the Spark-idiomatic analog of the reference's
HNSW-LSM (SURVEY §2.6, §7 Stage 3).

A *segment* is the unit the reference calls an HNSW memtable/SST (C2/C3:
``hnsw_table_builder.cc``, 250k vectors per table, ``params.yaml:58``). Here a
segment = one parquet directory of vector rows + a sidecar JSON with
statistics (count, min/max event_time). Searches prune segments whose
event-time range cannot satisfy the query's TTL window (C6 TTL file pruning,
``version_set.cc:2591``) before Spark ever plans a scan — a coarse file-level
skip on top of parquet row-group min/max pruning.

Mapping to reference concepts:
  append_segment   <- memtable flush (delayed flush = caller batches, C2)
  prune/search     <- Version::Get SST loop with TTL skip (C6)
  compact          <- manual compaction (auto-compaction disabled in the
                      reference, vector_options.h:46; size-tiered rebuild)
  evict            <- is_evict physical deletion of expired SSTs
                      (version_set.cc:2700-2730)

At cluster scale each segment is written with ``repartition`` sized to the
configured rows-per-file so executors read whole segments locally; the JSON
metadata is tiny driver state (O(segments), like the reference's manifest).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import MapType

from vstream_spark.storage.manifest import ManifestLog

_META = "segments.json"


def _dequantize_segment_df(df: DataFrame) -> DataFrame:
    """(emb_scale, emb_q ARRAY<TINYINT>) -> emb ARRAY<FLOAT> (C5 int8 codec)."""
    emb = F.transform(
        F.col("emb_q"), lambda x: (x.cast("double") * F.col("emb_scale")).cast("float")
    )
    cols = [c for c in df.columns if c not in ("emb_q", "emb_scale")]
    return df.select(*cols, emb.alias("emb"))


def resolve_index_kind(kind: str, seg: dict, auto_ivf_threshold: int) -> str:
    """'auto' -> hnsw up to the threshold, ivf above (bulk graph
    construction is O(n^2) BLAS and crosses over around 64k rows)."""
    if kind == "auto":
        return "ivf" if seg.get("count", 0) > auto_ivf_threshold else "hnsw"
    return kind


_ZONE_CORE_COLS = {"emb", "emb_q", "emb_scale", "op", "sbkt", "rbkt"}


def attr_zone_stats(path: str) -> dict[str, list]:
    """Per-segment zone map: ``{column: [min, max]}`` for every NUMERIC
    attribute column, read from parquet row-group FOOTER statistics — no
    data scan, O(files) driver work at flush. The SST-properties analog of
    the reference's per-table metadata: C6 prunes segments by event-time
    range; these let the searcher prune segments by ATTRIBUTE range for
    in-index filtered search (``storage/search.py``) before any task
    launches.

    Soundness discipline: a column appears ONLY if every row group either
    carries min/max statistics or is provably all-NULL for it (NULL rows
    can never satisfy a comparison, so skipping them keeps the range a
    superset of the matchable values). Any row group with data but no
    stats drops the column entirely — absent column = never pruned.
    Booleans and non-numerics are excluded. FLOAT/DOUBLE columns are
    excluded too (ADVICE r13): parquet writers may emit NaN-IGNORING
    min/max with has_min_max=True, while Spark and duckdb both order NaN
    ABOVE every value — a hint like ``score > 1e9`` could then zone-prune
    a segment whose NaN rows actually match, a silent false negative the
    deficiency check only catches when a query under-fills k. Integer
    columns have no NaN, so their footer range is exact.
    """
    import glob as _glob

    import pyarrow.parquet as _pq

    out: dict[str, list] = {}
    dropped: set[str] = set()
    for fp in sorted(_glob.glob(os.path.join(path, "*.parquet"))):
        md = _pq.ParquetFile(fp).metadata
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name in _ZONE_CORE_COLS or "." in name or name in dropped:
                    continue
                if col.physical_type in ("FLOAT", "DOUBLE"):
                    # NaN-stats hazard (see docstring): never zone-map floats
                    dropped.add(name)
                    out.pop(name, None)
                    continue
                st = col.statistics
                if st is not None and st.null_count == row_group.num_rows:
                    continue  # all-NULL group: no matchable values here
                if st is None or not st.has_min_max:
                    dropped.add(name)  # data without stats: never prune
                    out.pop(name, None)
                    continue
                mn, mx = st.min, st.max
                if (
                    isinstance(mn, bool)
                    or not isinstance(mn, (int, float))
                    or not isinstance(mx, (int, float))
                ):
                    dropped.add(name)
                    out.pop(name, None)
                    continue
                cur = out.get(name)
                if cur is None:
                    out[name] = [mn, mx]
                else:
                    cur[0] = min(cur[0], mn)
                    cur[1] = max(cur[1], mx)
    return out


def build_index_object(
    seg: dict,
    kind: str,
    metric: str = "l2",
    m: int = 16,
    ef_construction: int = 128,
    nlist: int = 0,
    nprobe: int = 8,
    auto_ivf_threshold: int = 65_536,
    pq_m: int = 8,
    pq_nbits: int = 8,
):
    """Build ONE segment's index object from its parquet via pyarrow —
    the single shared builder behind every artifact path: the flush-time
    sidecar build (``SegmentStore.build_segment_indexes``, one executor
    task per segment), and the search-side cache-miss rebuild
    (``storage/search.py::_segment_index``). Returns ``(resolved_kind,
    index)``.

    Codec-aware: int8 segments dequantize with the same IEEE ops as the
    Catalyst projection (float32(double(q) * double(scale))) — bitwise
    identical, so artifacts built here match artifacts built from the
    float surface. Op-aware: W2 tombstones (a delete marker STRICTLY newer
    than the insert it shadows kills it; insert wins ties —
    performLocalDeletes:86-96).
    """
    import glob

    import numpy as np
    import pyarrow.parquet as pq

    from vstream_spark.index.hnsw import build_index
    from vstream_spark.index.ivf import build_ivf
    from vstream_spark.index.pq import build_pq

    kind = resolve_index_kind(kind, seg, auto_ivf_threshold)
    int8 = seg.get("codec") == "int8"
    emb_cols = ["emb_q", "emb_scale"] if int8 else ["emb"]
    cols = ["id", *emb_cols, "event_time"]
    schema_names = pq.read_schema(
        glob.glob(seg["path"] + "/*.parquet")[0]
    ).names
    has_op = "op" in schema_names
    tbl = pq.read_table(seg["path"], columns=cols + (["op"] if has_op else []))
    pdf = tbl.to_pandas()
    ins = pdf[pdf["op"] == "I"] if has_op else pdf
    if int8:
        codes = np.stack(ins["emb_q"].to_numpy()).astype(np.float64)
        scales = ins["emb_scale"].to_numpy().astype(np.float64)
        vecs = (codes * scales[:, None]).astype(np.float32)
    else:
        vecs = np.stack(ins["emb"].to_numpy()).astype(np.float32)
    ids = ins["id"].to_numpy().astype(np.int64)
    ts = ins["event_time"].to_numpy().astype(np.int64)
    if kind == "ivf":
        idx = build_ivf(vecs, ids, ts=ts, metric=metric, nlist=nlist, nprobe=nprobe)
    elif kind == "pq":
        idx = build_pq(vecs, ids, ts=ts, metric=metric, m=pq_m, nbits=pq_nbits)
    else:
        idx = build_index(
            vecs, ids, ts=ts, metric=metric, M=m, ef_construction=ef_construction
        )
    if has_op:
        dels = pdf[pdf["op"] == "D"]
        for rid, rtime in zip(dels["id"].to_numpy(), dels["event_time"].to_numpy()):
            # neutral accessor (both index backends), not positional poking
            t = idx.get_ts(int(rid), None)
            if t is not None and int(rtime) > t:
                idx.mark_delete(int(rid))
    return kind, idx


class SegmentStore:
    """Append-only segmented vector store with TTL pruning + compaction."""

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        codec: str | None = None,
        dim: int | None = None,
        max_rows_per_segment: int | None = None,
    ):
        if codec not in (None, "int8"):
            raise ValueError(f"unsupported segment codec: {codec!r}")
        self.spark = spark
        self.base_dir = base_dir
        # C2 rotation cap (the reference's 250k vectors-per-HNSW-table,
        # params.yaml:58 / hnsw_table_builder.cc): batches above the cap
        # split into event-time-ranged segments via append_batch. None =
        # no rotation (append_segment's one-batch-one-segment contract).
        self.max_rows_per_segment = max_rows_per_segment
        # §1.3 parity: the reference's dimension is CONFIG, never inferred
        # (Parameters.java vectorDim; vector_options.h dim) — when set, every
        # flush validates it in the same stats pass (no extra scan)
        self.dim = dim
        # C5 vector compression (README "Vector compression";
        # compression/compression.cc): codec='int8' stores segments as
        # per-vector symmetric scalar-quantized (scale, q ARRAY<TINYINT>)
        # instead of ARRAY<FLOAT> — ~4x smaller at rest and over the wire.
        # read() dequantizes transparently, so every consumer (search,
        # compaction, index build) is codec-agnostic. Lossy by round(127
        # levels) — the ANN-tolerant trade the reference's design assumes.
        self.codec = codec
        os.makedirs(base_dir, exist_ok=True)
        # log-structured manifest: O(1) per flush (SCALE.md; the single-file
        # JSON rewrite was O(segments) per append — pathological at the
        # segment-per-micro-batch rate of a 100 TB ingest)
        self.manifest = ManifestLog(base_dir)
        legacy = os.path.join(base_dir, _META)
        if os.path.exists(legacy) and self.manifest.version() < 0:
            with open(legacy) as f:
                self.manifest.replace(json.load(f))
            os.replace(legacy, legacy + ".migrated")

    # -- manifest ------------------------------------------------------------

    def segments(self, as_of: int | None = None) -> list[dict]:
        """Segment list at manifest version ``as_of`` (default latest) —
        snapshot reads, the SequenceNumber-pinned Version the reference's LSM
        hands each open snapshot (db/version_set.cc). ``manifest.version()``
        after a flush is the token a caller pins to read that exact state
        later, regardless of subsequent flushes."""
        return self.manifest.snapshot(as_of)

    def _write_manifest(self, segs: list[dict]) -> None:
        self.manifest.replace(segs)

    # -- write path ----------------------------------------------------------

    def _flush_stats(self, vectors: DataFrame):
        """One aggregation pass: row count, event-time range, and the dim
        validation (§1.3: dim is config, never inferred; delete markers may
        legitimately carry NULL emb). Raises on dimension mismatch."""
        aggs = [
            F.count("*").alias("n"),
            F.min("event_time").alias("tmin"),
            F.max("event_time").alias("tmax"),
        ]
        check_dim = self.dim is not None and "emb" in vectors.columns
        if check_dim:
            aggs.append(
                F.sum(
                    (
                        F.col("emb").isNotNull() & (F.size("emb") != F.lit(self.dim))
                    ).cast("long")
                ).alias("bad_dim")
            )
        stats = vectors.agg(*aggs).collect()[0]
        if check_dim and int(stats["bad_dim"] or 0) > 0:
            raise ValueError(
                f"dimension mismatch: {int(stats['bad_dim'])} row(s) with "
                f"size(emb) != {self.dim} (dim is config, never inferred)"
            )
        return stats

    def append_segment(self, vectors: DataFrame, _stats=None) -> dict | None:
        """Flush a batch of vector rows (id, emb, event_time, ttl, op) as one
        immutable segment. Returns the segment metadata (None for empty).
        ``_stats``: precomputed :meth:`_flush_stats` row (append_batch's
        rotation sizing already ran the pass — no second scan)."""
        stats = _stats if _stats is not None else self._flush_stats(vectors)
        if stats["n"] == 0:
            return None
        seg_id = f"seg-{time.strftime('%Y%m%d%H%M%S')}-{uuid.uuid4().hex[:8]}"
        path = os.path.join(self.base_dir, seg_id)
        # C5 analog: the reference Gorilla-compresses vector blocks
        # (compression/compression.cc); Parquet's encodings + zstd are the
        # Spark-native equivalent. BYTE_STREAM_SPLIT was evaluated (r4): the
        # pyarrow writer can emit it (~9% smaller float leaves), but this
        # Spark's vectorized parquet reader throws "Unsupported encoding:
        # BYTE_STREAM_SPLIT" — BSS segments would break store.read(), so
        # zstd stands as the supported path (COVERAGE.md C5).
        vectors = self._encode(vectors)
        vectors.write.mode("errorifexists").option("compression", "zstd").parquet(path)
        seg = {
            "id": seg_id,
            "path": path,
            "count": int(stats["n"]),
            "min_event_time": int(stats["tmin"]),
            "max_event_time": int(stats["tmax"]),
        }
        zs = attr_zone_stats(path)
        if zs:
            seg["col_stats"] = zs  # attribute zone map (footer-read, no scan)
        if self.codec:
            seg["codec"] = self.codec
        self.manifest.append(seg)
        return seg

    def _encode(self, vectors: DataFrame) -> DataFrame:
        """Apply the store codec to the at-rest surface (C5 int8: per-vector
        symmetric scalar quantization); identity for the float codec."""
        if self.codec == "int8" and "emb" in vectors.columns:
            # scale hoisted to a column first: inlined in the code lambda it
            # re-evaluates the max-abs fold per array element (quantize.py)
            from vstream_spark.operators.quantize import quantize_expr, scale_expr

            others = [c for c in vectors.columns if c != "emb"]
            vectors = vectors.select(
                *others, "emb", scale_expr(F.col("emb")).alias("emb_scale")
            )
            _, q = quantize_expr(F.col("emb"), scale=F.col("emb_scale"))
            vectors = vectors.select(*others, "emb_scale", q.alias("emb_q"))
        return vectors

    def _write_time_ranged(
        self, df: DataFrame, n_out: int, cap: int | None, prefix: str
    ) -> list[dict]:
        """Shared time-ranged split writer (flush rotation AND compaction —
        one implementation so the two paths cannot drift): bucket ``df`` by
        event-time quantiles, write ALL buckets in ONE partitioned parquet
        job, then HARD-enforce the row ``cap`` by re-splitting any staged
        bucket still over it. Returns one ``{path, n, tmin, tmax}`` dict
        per final bucket, ordered by (tmin, path).

        Why quantiles, not hash: hash-split segments would all carry the
        full time range and defeat C6 TTL pruning forever after.

        Why the re-split: quantile bounds compare with strict ``>``, so
        duplicate timestamps COLLAPSE buckets — a batch stamped with one
        ingestion time would land as a single segment of n rows and
        silently void the 250k cap (and the O(n^2)-sensitive HNSW sidecar
        build behind it). Enforcement works off the POST-write stats (which
        the manifest needs anyway), so the common case — distinct
        timestamps, no collapse — pays zero extra scans; only offending
        staged buckets are re-read. The re-split key is deterministic and
        row-unique (xxhash64 over every data column plus a duplicate-group
        row_number — retry/speculation-safe, unlike
        monotonically_increasing_id; ADVICE r11), so duplicate-id mass
        cannot defeat it, the sizing carries ~10% headroom, and the
        worklist loops until every bucket is under cap — the cap is an
        invariant, not a best effort. Re-split buckets share one time
        range, which TTL pruning tolerates (overlapping ranges are fine —
        UNBOUNDED segments are not).
        """
        import shutil

        if n_out <= 1:
            bucket = F.lit(0)
        else:
            qs = [i / n_out for i in range(1, n_out)]
            bounds = df.agg(
                F.percentile_approx("event_time", qs, 10_000).alias("b")
            ).collect()[0]["b"]
            uniq = sorted({int(b) for b in bounds})
            bucket = sum(
                (F.col("event_time") > F.lit(b)).cast("int") for b in uniq
            )
        staging = os.path.join(
            self.base_dir,
            f"{prefix}-{time.strftime('%Y%m%d%H%M%S')}-{uuid.uuid4().hex[:8]}",
        )
        (
            df.withColumn("sbkt", bucket)
            .repartition(max(1, n_out), "sbkt")
            .write.option("compression", "zstd")
            .partitionBy("sbkt")
            .parquet(staging)
        )

        def _bucket_stats(root: str, col: str) -> list[tuple]:
            return [
                (
                    os.path.join(root, f"{col}={int(r[col])}"),
                    int(r["n"]),
                    int(r["tmin"]),
                    int(r["tmax"]),
                )
                for r in (
                    self.spark.read.parquet(root)
                    .groupBy(col)
                    .agg(
                        F.count("*").alias("n"),
                        F.min("event_time").alias("tmin"),
                        F.max("event_time").alias("tmax"),
                    )
                    .collect()
                )
            ]

        parts: list[dict] = []
        work = _bucket_stats(staging, "sbkt")
        while work:
            path, n, tmin, tmax = work.pop()
            if cap is None or n <= cap:
                parts.append(
                    {"path": path, "n": n, "tmin": tmin, "tmax": tmax}
                )
                continue
            # ~10% headroom so an even hash split lands under cap; the
            # worklist re-checks each piece, so residual skew re-splits
            m = max(2, -(-n * 10 // (cap * 9)))
            sub_dir = os.path.join(
                staging, f"resplit-{uuid.uuid4().hex[:8]}"
            )
            over = self.spark.read.parquet(path)
            # Deterministic row-unique re-split key (ADVICE r11):
            # monotonically_increasing_id() is nondeterministic across task
            # retries/speculation — a retried task would re-bucket rows
            # differently than the committed attempt wrote (the SPARK-23207
            # row-loss/duplication class). Instead: xxhash64 over EVERY data
            # column spreads distinct rows, and exact-duplicate rows get a
            # row_number within their duplicate group (identical rows are
            # interchangeable, so any 1..n assignment yields the same result
            # set on every attempt) — duplicate-row mass still cannot defeat
            # the cap. The per-split SALT breaks nested-modulus correlation:
            # every row in this bucket already satisfies hash % parent_m ==
            # this bucket's index, so re-hashing the SAME value mod a
            # divisor of parent_m would put all rows back into ONE child
            # bucket and loop forever. The salt is a driver-chosen literal
            # baked into the plan BEFORE the job runs — identical on every
            # task attempt, so retry-safety is preserved. Ordering the
            # window by the key columns themselves (not a constant) keeps
            # dup_seq deterministic even for DISTINCT rows that collide on
            # xxhash64 (null-field skipping or the 2^-64 case) — equal rows
            # remain interchangeable either way. Map-typed attribute
            # columns are excluded (Spark can neither hash nor order them);
            # rows differing only in a map column count as duplicates and
            # spread via dup_seq. The window's hash shuffle only runs on
            # the rare over-cap path, never the common flush.
            salt = os.path.basename(sub_dir)
            key_cols = [
                f.name
                for f in over.schema.fields
                if not isinstance(f.dataType, MapType)
            ]
            rowhash = F.xxhash64(*[F.col(c) for c in key_cols])
            dup_seq = F.row_number().over(
                Window.partitionBy(rowhash).orderBy(
                    *[F.col(c).asc_nulls_first() for c in key_cols]
                )
            )
            key = F.pmod(
                F.xxhash64(F.lit(salt), rowhash, dup_seq), F.lit(m)
            ).cast("int")
            (
                over.withColumn("rbkt", key)
                .repartition(m, "rbkt")
                .write.option("compression", "zstd")
                .partitionBy("rbkt")
                .parquet(sub_dir)
            )
            work.extend(_bucket_stats(sub_dir, "rbkt"))
            shutil.rmtree(path, ignore_errors=True)  # superseded staged dir
        return sorted(parts, key=lambda p: (p["tmin"], p["path"]))

    def append_batch(self, vectors: DataFrame) -> list[dict]:
        """Rotation-aware flush (C2 parity): a batch larger than
        ``max_rows_per_segment`` (the reference rotates HNSW tables at 250k
        vectors, ``params.yaml:58``) splits into event-time-RANGED segments
        via :meth:`_write_time_ranged` (shared with :meth:`compact`). Below
        the cap (or with no cap set) this is exactly one
        :meth:`append_segment`.

        The split writes all buckets in ONE partitioned parquet job
        (executors write their buckets concurrently — at 100 TB a big
        replay batch lands as hundreds of segments in a single pass), then
        appends one manifest entry per bucket.
        """
        cap = self.max_rows_per_segment
        if cap is None:
            seg = self.append_segment(vectors)
            return [seg] if seg is not None else []
        # one sizing pass shared with the no-split path: row count for the
        # split decision + the dim validation (no second scan either way)
        stats0 = self._flush_stats(vectors)
        n = int(stats0["n"])
        if n == 0:
            return []
        if n <= cap:
            seg = self.append_segment(vectors, _stats=stats0)
            return [seg] if seg is not None else []
        n_out = -(-n // cap)
        parts = self._write_time_ranged(self._encode(vectors), n_out, cap, "flush")
        segs = []
        for p in parts:
            seg = {
                "id": f"seg-{uuid.uuid4().hex[:12]}",
                "path": p["path"],
                "count": p["n"],
                "min_event_time": p["tmin"],
                "max_event_time": p["tmax"],
            }
            zs = attr_zone_stats(p["path"])
            if zs:
                seg["col_stats"] = zs
            if self.codec:
                seg["codec"] = self.codec
            self.manifest.append(seg)
            segs.append(seg)
        return segs

    def build_segment_index(
        self,
        seg: dict,
        metric: str = "l2",
        m: int = 16,
        ef_construction: int = 128,
        kind: str = "hnsw",
        nlist: int = 0,
        nprobe: int = 8,
        auto_ivf_threshold: int = 65_536,
        pq_m: int = 8,
        pq_nbits: int = 8,
    ) -> dict:
        """C3 analog (hnsw_table_builder.cc): persist an index artifact next
        to the segment's parquet so readers load instead of rebuild (C4).

        ``kind='hnsw'`` builds the graph; ``kind='ivf'`` builds the coarse
        k-means artifact (~20x cheaper — the scale path when flush rate
        outruns graph construction); ``kind='pq'`` builds product-quantized
        ADC codes (~32x less memory — for RAM-bound segments);
        ``kind='auto'`` picks hnsw up to ``auto_ivf_threshold`` rows and ivf
        above. The build runs in ONE executor task (the reference also
        builds each SST's graph single-node at flush); the artifact lands
        beside the data (``<segment>/_<kind>-<metric>.idx``, underscore
        prefix keeps it invisible to parquet dataset discovery).
        Rebuild-on-retry is safe: all builds are deterministic
        (label-sorted input). Multi-segment stores should use
        :meth:`build_segment_indexes` — one job, one task per segment.
        """
        return self.build_segment_indexes(
            [seg], metric=metric, m=m, ef_construction=ef_construction,
            kind=kind, nlist=nlist, nprobe=nprobe,
            auto_ivf_threshold=auto_ivf_threshold, pq_m=pq_m, pq_nbits=pq_nbits,
        )[0]

    def build_segment_indexes(
        self,
        segs: list[dict],
        metric: str = "l2",
        m: int = 16,
        ef_construction: int = 128,
        kind: str = "hnsw",
        nlist: int = 0,
        nprobe: int = 8,
        auto_ivf_threshold: int = 65_536,
        pq_m: int = 8,
        pq_nbits: int = 8,
    ) -> list[dict]:
        """C3 at fleet scale: build MANY segments' index artifacts in ONE
        Spark job, one task per segment. The reference builds each SST's
        graph single-node, but many SSTs build CONCURRENTLY across the
        cluster as memtables rotate — this is that shape: a store that
        flushed thousands of segments indexes them cluster-wide instead of
        one sequential driver loop of single-task jobs (the r11 change;
        the old per-segment path also repartition(1)-shuffled every row of
        the segment through an exchange just to reach its one build task —
        the task now reads the segment parquet directly via pyarrow, the
        same reader the search-side cache uses).

        Each task writes the artifact beside its segment (tmp + atomic
        rename, unique tmp suffix so speculative/retried tasks can't
        torn-write); the manifest updates once, driver-side, after the job.
        """
        if not segs:
            return []
        params = dict(
            m=m, ef_construction=ef_construction, nlist=nlist, nprobe=nprobe,
            auto_ivf_threshold=auto_ivf_threshold, pq_m=pq_m, pq_nbits=pq_nbits,
        )

        def one(seg: dict) -> tuple[str, str]:
            import os
            import uuid

            rkind, idx = build_index_object(seg, kind, metric, **params)
            out = os.path.join(seg["path"], f"_{rkind}-{metric}.idx")
            tmp = f"{out}.tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "wb") as f:
                f.write(idx.dumps())
            os.replace(tmp, out)
            return seg["id"], out

        sc = self.spark.sparkContext
        results = dict(sc.parallelize(segs, len(segs)).map(one).collect())
        out_segs = []
        for seg in segs:
            out = results[seg["id"]]
            self.manifest.update(seg["id"], index_file=out)
            out_segs.append(dict(seg, index_file=out))
        return out_segs

    def dump(self) -> DataFrame | None:
        """M4 debug op (RocksDBKeyedProcessFunction.dump:143-147): all ids
        currently stored, with their segment of origin."""
        segs = self.segments()
        if not segs:
            return None
        parts = []
        for s in segs:
            parts.append(
                self.spark.read.parquet(s["path"]).select("id").withColumn(
                    "segment_id", F.lit(s["id"])
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def upsert_batch(self, batch: DataFrame) -> dict | None:
        """W6 buffered upsert (``VectorKeyedDataProcessFunction.java:16-100``):
        annihilate insert+later-delete pairs *within the batch* before
        flushing (``performLocalDeletes:86-96`` — a delete cancels a buffered
        insert only when its event_time is strictly later; ties keep the
        insert). Surviving delete markers are flushed too — they tombstone
        matching ids in OLDER segments at read time (last-writer-wins).
        """
        w = Window.partitionBy("id").orderBy(
            F.col("event_time").desc(),
            F.when(F.col("op") == "I", F.lit(0)).otherwise(F.lit(1)).asc(),
        )
        last = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        # rotation-aware (no-op without max_rows_per_segment). Single
        # segment: its metadata verbatim. Rotated flush: an AGGREGATE dict
        # — count is the full flushed total (never one shard's), the time
        # range spans all shards, and every segment rides under
        # ``"segments"`` (returning segs[-1] under-reported the flush and
        # hid the other shards from the caller).
        segs = self.append_batch(last)
        if not segs:
            return None
        if len(segs) == 1:
            return segs[0]
        # id=None makes the aggregate unmistakable: it is NOT one segment's
        # metadata (no path/codec either) — address shards via "segments"
        return {
            "id": None,
            "count": sum(s["count"] for s in segs),
            "min_event_time": min(s["min_event_time"] for s in segs),
            "max_event_time": max(s["max_event_time"] for s in segs),
            "segments": segs,
        }

    def delete_where(self, predicate, event_time: int | None = None) -> dict | None:
        """Bulk erasure: flush delete markers for every LIVE id matching
        ``predicate`` (the GDPR / right-to-be-forgotten maintenance op a
        mutable vector store needs beyond per-record stream deletes).

        Logical-first like the stream path: ONE new tombstone segment is
        appended — no data segment is rewritten — and LWW masks the ids at
        read time; physical reclamation happens at the next compact/evict.
        At 100 TB this is a scan + filter + small flush, never a rewrite of
        the store.

        LWW only masks strictly-later, so a stale ``event_time`` would
        silently leave "erased" rows visible. The victims scan therefore
        computes ``max(event_time)`` of the matched inserts and (a) defaults
        ``event_time`` to max+1 when the caller omits it, (b) raises
        ``ValueError`` when the caller supplies one that is not strictly
        later — erasure can never silently no-op."""
        live = self.read()
        if live is None:
            return None
        victims = live.filter(F.col("op") == "I").filter(predicate)
        row = victims.agg(F.max("event_time").alias("mx")).collect()[0]
        if row["mx"] is None:  # predicate matched nothing: nothing to erase
            return None
        max_ts = int(row["mx"])
        if event_time is None:
            event_time = max_ts + 1
        elif int(event_time) <= max_ts:
            raise ValueError(
                f"delete_where event_time={event_time} is not strictly later "
                f"than the victims' max insert event_time={max_ts}; LWW would "
                "silently leave those rows visible. Pass a later timestamp or "
                "omit event_time to default to max+1."
            )
        markers = victims.select(
            "id",
            "emb",
            F.lit(int(event_time)).cast("long").alias("event_time"),
            "ttl",
            F.lit("D").alias("op"),
        ).dropDuplicates(["id"])
        return self.append_segment(markers)


    # -- read path -----------------------------------------------------------

    def prune(
        self,
        min_event_time: int | None = None,
        max_event_time: int | None = None,
        as_of: int | None = None,
    ) -> list[dict]:
        """Segments whose [min,max] event-time range intersects the window
        (C6: skip SSTs with latest_key_time < query freshness bound)."""
        out = []
        for seg in self.segments(as_of):
            if min_event_time is not None and seg["max_event_time"] < min_event_time:
                continue
            if max_event_time is not None and seg["min_event_time"] > max_event_time:
                continue
            out.append(seg)
        return out

    def read(
        self,
        min_event_time: int | None = None,
        max_event_time: int | None = None,
        as_of: int | None = None,
    ) -> DataFrame | None:
        """Union of pruned segments as one DataFrame (None if nothing
        survives pruning). The event-time predicate is re-applied so parquet
        row-group pruning also kicks in below the segment skip. ``as_of``
        pins the read to an earlier manifest version (time travel): segments
        flushed after that version are invisible, exactly like an LSM read
        through an old SequenceNumber snapshot."""
        segs = self.prune(min_event_time, max_event_time, as_of=as_of)
        if not segs:
            return None
        df = self._read_segments(segs)
        if min_event_time is not None:
            df = df.filter(F.col("event_time") >= min_event_time)
        if max_event_time is not None:
            df = df.filter(F.col("event_time") <= max_event_time)
        return df

    def _read_segments(self, segs: list[dict]) -> DataFrame:
        """Union of segments with the float embedding surface restored —
        int8 segments dequantize in the scan projection (one codegen
        transform, no shuffle), so every consumer stays codec-agnostic."""
        plain = [s["path"] for s in segs if not s.get("codec")]
        quant = [s["path"] for s in segs if s.get("codec") == "int8"]
        parts = []
        if plain:
            parts.append(self.spark.read.parquet(*plain))
        if quant:
            parts.append(_dequantize_segment_df(self.spark.read.parquet(*quant)))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    # -- maintenance ---------------------------------------------------------

    def compact(self, max_rows_per_segment: int = 250_000) -> list[dict]:
        """Size-tiered compaction into EVENT-TIME-RANGED segments (the
        reference disables RocksDB auto-compaction and relies on explicit
        maintenance). Output segments are bucketed by event-time quantiles,
        not hash, so C6 TTL pruning stays effective after compaction — a
        hash merge would give every segment the full time range and make
        every future query scan everything. Last-writer-wins dedup happens
        at read time, not here, to preserve delete markers across TTL
        windows. Index artifacts are rebuilt for the new segments when any
        input segment carried one (same kind, inferred from the file name).
        """
        segs = self.segments()
        if len(segs) <= 1:
            return segs
        codecs = {s.get("codec") for s in segs}
        if len(codecs) == 1:
            # uniform schema: merge at-rest bytes as-is — int8 segments stay
            # int8 with NO requantization loss (codes copied, not recoded)
            out_codec = codecs.pop()
            df = self.spark.read.parquet(*[s["path"] for s in segs])
        else:
            # mixed store (e.g. codec flipped mid-life): normalize to the
            # store's configured codec via the float surface (one recode)
            out_codec = self.codec
            df = self._read_segments(segs)
            if out_codec == "int8" and "emb" in df.columns:
                from vstream_spark.operators.quantize import (
                    quantize_expr,
                    scale_expr,
                )

                others = [c for c in df.columns if c != "emb"]
                df = df.select(
                    *others, "emb", scale_expr(F.col("emb")).alias("emb_scale")
                )
                _, q = quantize_expr(F.col("emb"), scale=F.col("emb_scale"))
                df = df.select(*others, "emb_scale", q.alias("emb_q"))
        total = df.count()
        n_out = max(1, -(-total // max_rows_per_segment))
        old_paths = [s["path"] for s in segs]
        old_kinds = {
            os.path.basename(s["index_file"]).split("-")[0].lstrip("_")
            for s in segs
            if s.get("index_file")
        }
        metrics = {
            os.path.basename(s["index_file"]).rsplit("-", 1)[-1].removesuffix(".idx")
            for s in segs
            if s.get("index_file")
        }
        parts = self._write_time_ranged(df, n_out, max_rows_per_segment, "compact")
        new_segs = []
        for p in parts:
            seg = {
                "id": f"seg-compact-{uuid.uuid4().hex[:8]}",
                "path": p["path"],
                "count": p["n"],
                "min_event_time": p["tmin"],
                "max_event_time": p["tmax"],
            }
            zs = attr_zone_stats(p["path"])
            if zs:
                seg["col_stats"] = zs
            if out_codec:
                seg["codec"] = out_codec
            new_segs.append(seg)
        self.manifest.replace(new_segs)
        # remove old segment data best-effort (local fs; on object stores this
        # is the VACUUM step)
        import shutil

        for p in old_paths:
            shutil.rmtree(p, ignore_errors=True)
        # carry index artifacts forward: rebuild per new segment, same kind
        # — all new segments build in one parallel job per (kind, metric)
        for kind in old_kinds:
            for metric in metrics or {"l2"}:
                new_segs = self.build_segment_indexes(
                    new_segs, metric=metric, kind=kind
                )
        return self.segments()

    def evict(self, older_than_event_time: int) -> int:
        """Physically drop segments entirely older than the horizon
        (is_evict, version_set.cc:2700-2730). Returns #segments dropped."""
        import shutil

        gone = []
        for seg in self.segments():
            if seg["max_event_time"] < older_than_event_time:
                shutil.rmtree(seg["path"], ignore_errors=True)
                gone.append(seg["id"])
        if gone:
            self.manifest.remove(gone)
        return len(gone)
