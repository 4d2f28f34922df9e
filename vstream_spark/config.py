"""Engine configuration objects.

Mirrors the configuration surface of the reference's ``util/Parameters.java``
(456 lines of YAML-backed fields) and the C++ ``VectorColumnFamilyOptions`` /
``VectorSearchOptions`` (``plugin/vectorbackend/options/vector_options.h:24-95``)
— but only the fields that are meaningful for a Spark-first engine. Dimension
and metric are explicit config, never inferred (reference ``Parameters.java:40``,
``vector_options.h:25``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

SUPPORTED_METRICS = ("l2", "ip", "cosine")


@dataclass(frozen=True)
class VectorIndexConf:
    """Per-collection vector index configuration.

    Reference mapping (SURVEY §2.6 C10): dim/metric from
    ``VectorColumnFamilyOptions`` (``vector_options.h:24-53``); ``k`` and
    termination knobs from ``VectorSearchOptions`` (``vector_options.h:79-95``);
    HNSW shape (M/efConstruction/efSearch) from ``params.yaml:54-56`` —
    retained for config parity although the round-1 per-partition worker is a
    vectorized brute-force/IVF scan rather than a graph index.
    ``max_elements_per_segment`` is the reference's 250k vectors-per-HNSW-table
    (``params.yaml:58``).
    """

    dim: int = 128
    metric: str = "l2"  # 'l2' (squared L2), 'ip', 'cosine' — hnswlib.h:252
    k: int = 10
    m: int = 16
    ef_construction: int = 128
    ef_search: int = 16
    max_elements_per_segment: int = 250_000
    # Segment artifact kind: 'hnsw' (graph; best recall/latency), 'ivf'
    # (coarse-quantized flat; ~20x cheaper flush-time build — the scale path
    # when segment churn outruns graph construction), 'pq' (product-quantized
    # ADC codes, ~32x less memory — the path when segments outgrow executor
    # RAM), or 'auto' (hnsw up to auto_ivf_threshold rows, ivf above: bulk
    # graph construction is O(n^2) BLAS and crosses over around 64k rows).
    # nlist=0 -> ~sqrt(n).
    index_kind: str = "hnsw"
    nlist: int = 0
    nprobe: int = 8
    auto_ivf_threshold: int = 65_536
    pq_m: int = 8  # PQ subvectors (dim % pq_m == 0)
    pq_nbits: int = 8  # bits per code (<= 8)
    # ADC over-fetch factor: the worker rescores refine*k ADC candidates
    # exactly against the partition's float block (faiss IndexRefineFlat
    # pattern) — recovers the recall quantization costs at larger shards
    pq_refine: int = 4
    # Segment-search job granularity (r11 VERDICT #1): the searcher visits
    # this many temperature-ordered segments PER Spark job (their partials
    # union inside one job; the M1 running merge + C8 termination check run
    # once per chunk). 1 = the reference's SST-at-a-time shape
    # (version_set.cc:2585-2697, where the per-file step is a C++ call, not
    # a scheduler round trip); >1 amortizes driver job-launch latency at
    # multi-segment stores without changing results (a chunk searches a
    # superset of what one-at-a-time would before each termination check).
    segments_per_job: int = 4
    # C4 block-prefetch analog (r13 VERDICT #2, hnsw_block_prefetcher.cc):
    # submit chunk n+1's branch job from a lookahead thread WHILE chunk n's
    # partials merge + the termination check round-trips, so executors never
    # idle between chunks; a lookahead in flight when termination fires is
    # discarded (at most one chunk of wasted work — the prefetcher's own
    # trade). Pure job scheduling: results, temperature and EMA state are
    # identical with it on or off.
    chunk_lookahead: bool = True
    # FilterSeqTs parity toggle (hnswlib.h:135-146): move the freshness
    # bound INTO graph traversal — stale nodes route but never occupy ef
    # result slots, so a hard TTL can't under-fill k the way the post-hoc
    # filter can. Off by default: the unfiltered walk is the hash-matched
    # hot path, and the flat IVF/PQ scans already filter pre-selection
    # (the flag is a no-op there).
    ts_in_traversal: bool = False
    # Adaptive early termination across segments (db/version_set.cc:2643-2697).
    termination_weight: float = 0.01
    termination_factor: float = 0.8
    termination_threshold: float = 0.0
    termination_lower_bound: float = 0.0

    def __post_init__(self) -> None:
        if self.metric not in SUPPORTED_METRICS:
            raise ValueError(f"metric must be one of {SUPPORTED_METRICS}, got {self.metric!r}")
        if self.dim <= 0:
            raise ValueError("dim must be positive")
        if self.index_kind not in ("hnsw", "ivf", "pq", "auto"):
            raise ValueError(
                f"index_kind must be 'hnsw', 'ivf', 'pq' or 'auto', got {self.index_kind!r}"
            )
        if self.segments_per_job < 1:
            raise ValueError("segments_per_job must be >= 1")


@dataclass(frozen=True)
class SearchOptions:
    """Per-QUERY search options — ``VectorSearchOptions``
    (``vector_options.h:79-95``): the reference lets every search carry its
    own k plus execution toggles; collection-level defaults live in
    ``VectorIndexConf``.

    search_sst=False restricts the search to the newest segment only (the
    memtable-analog — the reference skips SST files and answers from the
    in-memory table); trigger_sort toggles the hot-cold temperature ordering
    for this query (W4 periodic re-sort is driven by the searcher's stats
    either way — this just bypasses the ordering); is_evict physically drops
    segments that are entirely older than the query's freshness bound before
    searching (``version_set.cc:2700-2730``).
    """

    k: int | None = None
    ef_search: int | None = None
    search_sst: bool = True
    trigger_sort: bool = True
    is_evict: bool = False
    # per-query early-termination aggressiveness override (None = the
    # collection default VectorIndexConf.termination_factor)
    termination_factor: float | None = None


@dataclass(frozen=True)
class PartitionerConf:
    """Exchange-operator configuration (SURVEY §2.3).

    ``kind`` ∈ {'simple','lsh','lsh+random','lsh+proximity','lsh+hilbert',
    'lsh+zorder','lsh+gray','lsh+peano','kmeans','hilbert'} — the dispatch
    names of ``PartitionFunction.getPartitionFunction``
    (``partitioner/PartitionFunction.java:82-218``).

    LSH params mirror ``params.yaml:48-53``: ``num_families`` = k1 (replication
    families), ``num_hashes`` = k2 (hashes per family), ``bucket_width`` = r in
    ``h = floor((a.v + b)/r)`` (``L2Hash.java:35-38``), ``sfc_bits`` = curve
    resolution, ``update_interval``/``max_retained`` = dynamic-quantile epoch
    re-learning (``LSHashSpaceFillingPartitioner.java:118-145``).
    """

    kind: str = "lsh"
    num_partitions: int = 8
    seed: int = 42
    num_families: int = 1  # k1: replication factor for data
    num_hashes: int = 4  # k2: hashes per family
    bucket_width: float = 5.0  # r
    sfc_bits: int = 7
    num_probes: int = 0  # multiprobe fan-out (lsh+proximity)
    replication_factor: int = 1  # kmeans/hilbert nearest-R routing
    # IVF-style asymmetric fan-out: data stays at replication_factor cells,
    # queries probe query_fanout nearest cells (None = same as data side).
    query_fanout: int | None = None
    update_interval: int = 7_200_000  # epoch re-learn period (ms)
    max_retained: int = 1_000_000  # history window for quantile learning
    # Epoch freshness for P5 query fan-out (isFresh,
    # LSHashSpaceFillingPartitioner.java:353-355): queries skip epochs whose
    # time range cannot contain data within [event_time - max_ttl, event_time].
    # None = fan out to every learned epoch (no pruning).
    max_ttl: int | None = None
    # SAX / Odyssey (P8: OdysseyPartitionFunction.java:160-329, sax/SAX.java)
    sax_word_len: int = 8  # PAA segments per word
    sax_alphabet: int = 4  # symbols per segment (Gaussian breakpoints)
    hot_tracker_size: int = 8  # top-λ hot words spread across groups


@dataclass(frozen=True)
class EngineConf:
    """Top-level engine config: index + partitioner + freshness defaults."""

    index: VectorIndexConf = field(default_factory=VectorIndexConf)
    partitioner: PartitionerConf = field(default_factory=PartitionerConf)
    max_ttl_ms: int = 2_400_000  # params.yaml:35 freshness window
