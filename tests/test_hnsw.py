"""Numpy HNSW index: recall, tombstones, freshness filter, persistence."""

import numpy as np
import pytest

from vstream_spark.index.hnsw import HnswIndex, build_index


def _data(n=400, dim=16, seed=3):
    rng = np.random.RandomState(seed)
    vecs = rng.rand(n, dim).astype(np.float32)
    labels = np.arange(n, dtype=np.int64)
    return vecs, labels


def _exact_topk(vecs, labels, q, k, min_ts=None, ts=None, deleted=()):
    d = ((vecs.astype(np.float64) - q) ** 2).sum(axis=1)
    ok = np.ones(len(vecs), dtype=bool)
    if min_ts is not None:
        ok &= ts >= min_ts
    for lb in deleted:
        ok[labels == lb] = False
    order = np.lexsort((labels[ok], d[ok]))[:k]
    return labels[ok][order]


def test_recall_at_10_high():
    vecs, labels = _data()
    idx = build_index(vecs, labels, M=16, ef_construction=128)
    rng = np.random.RandomState(9)
    hits = total = 0
    for q in rng.rand(50, vecs.shape[1]):
        got, dists = idx.search(q, 10, ef_search=64)
        want = _exact_topk(vecs, labels, q, 10)
        hits += len(set(got) & set(want))
        total += 10
        assert list(dists) == sorted(dists)
    assert hits / total >= 0.95


def test_deterministic_build_and_search():
    vecs, labels = _data(200)
    a = build_index(vecs, labels)
    b = build_index(vecs, labels)
    q = vecs[17].astype(np.float64)
    assert a.search(q, 5)[0].tolist() == b.search(q, 5)[0].tolist()
    # self is its own nearest neighbor, exact distance 0
    lbs, ds = a.search(q, 1, ef_search=32)
    assert lbs[0] == 17 and ds[0] == 0.0


def test_mark_delete_tombstone():
    vecs, labels = _data(100)
    idx = build_index(vecs, labels)
    q = vecs[5].astype(np.float64)
    assert idx.search(q, 1)[0][0] == 5
    assert idx.mark_delete(5)
    assert 5 not in idx.search(q, 10)[0]
    assert not idx.mark_delete(99999)
    # re-adding undeletes (upsert, W2 then W1 on the same label)
    idx.add_point(vecs[5], 5, ts=7)
    assert idx.search(q, 1)[0][0] == 5


def test_freshness_filter_min_ts():
    vecs, labels = _data(100)
    ts = np.arange(100, dtype=np.int64)  # label i inserted at time i
    idx = build_index(vecs, labels, ts=ts)
    q = vecs[10].astype(np.float64)
    got, _ = idx.search(q, 10, ef_search=200, min_ts=50)
    assert all(lb >= 50 for lb in got)
    want = _exact_topk(vecs, labels, q, 10, min_ts=50, ts=ts)
    assert set(got) & set(want)  # approximate but overlapping


def test_save_load_roundtrip():
    vecs, labels = _data(150)
    idx = build_index(vecs, labels)
    idx.mark_delete(3)
    clone = HnswIndex.loads(idx.dumps())
    q = vecs[42].astype(np.float64)
    assert clone.search(q, 5)[0].tolist() == idx.search(q, 5)[0].tolist()
    assert 3 not in clone.search(vecs[3].astype(np.float64), 10)[0]


def test_bulk_build_recall_and_determinism():
    """build_index_bulk (the flush-time bulk constructor) must match or beat
    incremental insertion on recall and be deterministic."""
    from vstream_spark.index.hnsw import build_index_bulk

    vecs, labels = _data(500)
    ts = np.arange(500, dtype=np.int64)
    a = build_index_bulk(vecs, labels, ts=ts, M=16, ef_construction=128)
    b = build_index_bulk(vecs, labels, ts=ts, M=16, ef_construction=128)
    assert a.entry == b.entry and a.max_level == b.max_level
    assert all(a.links[i] == b.links[i] for i in range(a.n))
    rng = np.random.RandomState(4)
    hits = 0
    for q in rng.rand(40, vecs.shape[1]):
        got, ds = a.search(q, 10, ef_search=64)
        want = _exact_topk(vecs, labels, q, 10)
        hits += len(set(got) & set(want))
        assert list(ds) == sorted(ds)
    assert hits / 400 >= 0.95
    # freshness + tombstones work on the bulk-built graph too
    got, _ = a.search(vecs[10].astype(np.float64), 10, ef_search=200, min_ts=250)
    assert all(a.ts[a._by_label[int(lb)]] >= 250 for lb in got)
    assert a.mark_delete(int(got[0]))
    assert got[0] not in a.search(vecs[10].astype(np.float64), 10, ef_search=200, min_ts=250)[0]


def test_bulk_auto_threshold_and_parity():
    """build_index auto-selects bulk for shards >= threshold; both paths
    expose the same search API and serialize identically."""
    from vstream_spark.index.hnsw import _BULK_THRESHOLD, build_index

    vecs, labels = _data(64)
    small = build_index(vecs, labels)           # below threshold -> incremental
    forced = build_index(vecs, labels, bulk=True)
    q = vecs[5].astype(np.float64)
    assert small.search(q, 1)[0][0] == 5
    assert forced.search(q, 1)[0][0] == 5
    clone = HnswIndex.loads(forced.dumps())
    assert clone.search(q, 5)[0].tolist() == forced.search(q, 5)[0].tolist()
    assert _BULK_THRESHOLD >= 512


def test_bulk_empty_and_tiny():
    from vstream_spark.index.hnsw import build_index_bulk

    e = build_index_bulk(np.zeros((0, 8)), np.empty(0, dtype=np.int64))
    lbs, ds = e.search(np.zeros(8), 5)
    assert len(lbs) == 0
    one = build_index_bulk(np.ones((1, 8)), np.array([7], dtype=np.int64))
    lbs, _ = one.search(np.ones(8), 3)
    assert lbs.tolist() == [7]


def test_bad_metric():
    with pytest.raises(ValueError):
        HnswIndex(8, metric="hamming")


def test_ip_and_cosine_metrics():
    vecs, labels = _data(120)
    for metric in ("ip", "cosine"):
        idx = build_index(vecs, labels, metric=metric)
        got, ds = idx.search(vecs[7].astype(np.float64), 5, ef_search=64)
        assert len(got) == 5
        assert list(ds) == sorted(ds)


def test_worker_integration_recall(spark):
    """knn_partitioned_worker with index_conf builds per-partition HNSW."""
    from vstream_spark.config import PartitionerConf, VectorIndexConf
    from vstream_spark.operators.knn import knn_exact
    from vstream_spark.operators.partitioned import knn_partitioned_worker

    rng = np.random.RandomState(11)
    rows = [(int(i), rng.rand(16).astype(float).tolist()) for i in range(300)]
    vectors = spark.createDataFrame(rows, "id long, emb array<float>")
    queries = vectors.filter("id % 30 = 0").selectExpr("id as qid", "emb")
    conf = PartitionerConf(kind="simple", num_partitions=4)
    iconf = VectorIndexConf(dim=16, m=16, ef_construction=128, ef_search=64)
    got = knn_partitioned_worker(
        vectors, queries, conf, k=5, metric="l2", index_conf=iconf
    )
    want = knn_exact(vectors, queries, k=5, metric="l2")
    g = {(r.qid, r.neighbor_id) for r in got.collect()}
    w = {(r.qid, r.neighbor_id) for r in want.collect()}
    assert len(g & w) / len(w) >= 0.9


def test_reference_config_recall_harness(spark):
    """BASELINE.md recall constants: M=16, efConstruction=128, efSearch=16,
    k=10 — the reference's own accuracy-harness configuration. Exact mode is
    the ground truth; ANN recall must be usable at efS=16 and improve
    monotonically with efSearch (the reference's tuning axis)."""
    from vstream_spark.config import PartitionerConf, VectorIndexConf
    from vstream_spark.functions.metrics import mean_recall
    from vstream_spark.operators.knn import knn_exact
    from vstream_spark.operators.partitioned import knn_partitioned_worker
    from vstream_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    vectors = emb.selectExpr("vec_id as id", "embedding as emb")
    queries = emb.filter("vec_id % 25 = 0").selectExpr("vec_id as qid", "embedding as emb")
    gt = knn_exact(vectors, queries, k=10, metric="l2")
    conf = PartitionerConf(kind="simple", num_partitions=4)
    recalls = {}
    for efs in (16, 64):
        ann = knn_partitioned_worker(
            vectors, queries, conf, k=10, metric="l2",
            index_conf=VectorIndexConf(dim=64, m=16, ef_construction=128, ef_search=efs),
        )
        recalls[efs] = mean_recall(ann, gt, 10)
    assert recalls[16] >= 0.7
    assert recalls[64] >= recalls[16]
    assert recalls[64] >= 0.9


def test_bulk_approx_graph_recall_floor():
    """Above _APPROX_THRESHOLD the bulk builder uses clustered-candidate
    approximate kNN links (r5). Gate its recall on clustered data (the
    testdata embeddings' shape): recall@10 at ef_search=128 must clear 0.85
    on 12k vectors in 10 gaussian blobs — well above the threshold so the
    approx path is the one exercised."""
    import numpy as np

    from vstream_spark.index.hnsw import _APPROX_THRESHOLD, build_index_bulk

    rng = np.random.RandomState(5)
    n, dim = 12_000, 32
    assert n >= _APPROX_THRESHOLD
    centers = rng.rand(10, dim) * 4
    vecs = (centers[rng.randint(0, 10, n)] + rng.randn(n, dim) * 0.15).astype(
        np.float32
    )
    labels = np.arange(n)
    idx = build_index_bulk(vecs, labels, metric="l2")
    q = vecs[rng.choice(n, 100, replace=False)] + rng.randn(100, dim).astype(
        np.float32
    ) * 0.05
    v64 = vecs.astype(np.float64)
    hits = 0
    for j in range(100):
        d = ((v64 - q[j]) ** 2).sum(axis=1)
        truth = set(np.lexsort((labels, d))[:10].tolist())
        got, _ = idx.search(q[j], 10, ef_search=128)
        hits += len(truth & set(got.tolist()))
    recall = hits / 1000
    assert recall >= 0.85, recall


def test_bulk_approx_graph_recall_floor_uniform():
    """The hardest case for the clustered candidate generator: 64-dim
    UNIFORM random (no cluster structure, so every cell boundary cuts true
    neighbor pairs). r5/r6 shipped 0.78 recall@10 at ef_search=128 here
    with the 2-cell spill; the spill=4/cell_size=320 retune (r7) clears the
    0.85 gate (measured 0.887 at 64k, 0.92+ at this n=12k; the exact-graph
    ceiling at 64k is 0.911). Gate at the test's n to keep runtime sane —
    the SCALE.md 64k numbers are the full-size record."""
    import numpy as np

    from vstream_spark.index.hnsw import _APPROX_THRESHOLD, build_index_bulk

    rng = np.random.RandomState(5)
    n, dim = 12_000, 64
    assert n >= _APPROX_THRESHOLD
    vecs = rng.rand(n, dim).astype(np.float32)
    labels = np.arange(n)
    idx = build_index_bulk(vecs, labels, metric="l2")
    q = rng.rand(100, dim).astype(np.float32)
    v64 = vecs.astype(np.float64)
    hits = 0
    for j in range(100):
        d = ((v64 - q[j]) ** 2).sum(axis=1)
        truth = set(np.lexsort((labels, d))[:10].tolist())
        got, _ = idx.search(q[j], 10, ef_search=128)
        hits += len(truth & set(got.tolist()))
    recall = hits / 1000
    assert recall >= 0.85, recall


def _install_fake_hnswlib(monkeypatch):
    """A minimal hnswlib-API-shaped module (Index with init_index /
    add_items / knn_query / mark_deleted / get_items) backed by brute-force
    numpy. Lets the backend seam be EXERCISED in environments where the
    real library is absent (r9 VERDICT stretch #8: the swap-in claim was
    asserted, not pinned)."""
    import sys
    import types

    import numpy as np

    class _FakeIndex:
        def __init__(self, space, dim):
            assert space in ("l2", "ip", "cosine")
            self.space, self.dim = space, dim
            self._v, self._l = {}, []
            self._deleted = set()

        def init_index(self, max_elements, M, ef_construction, random_seed):
            self.M, self.ef_construction = M, ef_construction

        def set_num_threads(self, n):
            pass

        def set_ef(self, ef):
            pass

        def get_max_elements(self):
            return 1 << 30

        def resize_index(self, n):
            pass

        def add_items(self, vecs, labels):
            # real hnswlib: existing label = in-place update, but the
            # internal deleted flag is NOT cleared (unmark_deleted is the
            # only way back) — mirror it so the adapter's re-add path is
            # pinned against the real semantics
            for v, lb in zip(np.asarray(vecs), np.asarray(labels)):
                self._v[int(lb)] = np.asarray(v, dtype=np.float64)

        def get_items(self, ids):
            # real hnswlib raises for unknown AND marked-deleted labels
            for i in ids:
                if int(i) not in self._v or int(i) in self._deleted:
                    raise RuntimeError("Label not found")
            return np.stack([self._v[int(i)] for i in ids])

        def mark_deleted(self, lb):
            # real hnswlib raises on unknown labels and on double deletes
            if int(lb) not in self._v:
                raise RuntimeError("Label not found")
            if int(lb) in self._deleted:
                raise RuntimeError(
                    "The requested to delete element is already deleted"
                )
            self._deleted.add(int(lb))

        def unmark_deleted(self, lb):
            if int(lb) not in self._deleted:
                raise RuntimeError(
                    "The requested to undelete element is not deleted"
                )
            self._deleted.discard(int(lb))

        def knn_query(self, q, k, filter=None):
            # real hnswlib raises when k exceeds the retrievable element
            # count — mirror it so the adapter's live-count clamp is pinned
            if k > len(self._v) - len(self._deleted):
                raise RuntimeError(
                    "Cannot return the results in a contiguous 2D array. "
                    "Probably ef or M is too small"
                )
            q = np.asarray(q, dtype=np.float64)[0]
            cand = []
            for lb, v in self._v.items():
                if lb in self._deleted or (filter and not filter(lb)):
                    continue
                if self.space == "l2":
                    d = float(((v - q) ** 2).sum())
                else:
                    d = 1.0 - float(v @ q)
                cand.append((d, lb))
            cand.sort()
            cand = cand[:k]
            return (
                np.asarray([[lb for _, lb in cand]], dtype=np.int64),
                np.asarray([[d for d, _ in cand]], dtype=np.float64),
            )

    mod = types.ModuleType("hnswlib")
    mod.Index = _FakeIndex
    monkeypatch.setitem(sys.modules, "hnswlib", mod)


def test_native_backend_seam_no_operator_change(monkeypatch):
    """With VSTREAM_SPARK_HNSW_BACKEND=hnswlib, build_index — the ONE seam
    every operator calls — returns the native adapter, and search honors
    the full engine contract (tie-break, min_ts freshness, tombstones,
    dumps/loads through the shared artifact loader) with zero changes at
    any call site."""
    import numpy as np

    from vstream_spark.index.hnsw import HnswIndex, build_index
    from vstream_spark.index.native import NativeHnswIndex

    _install_fake_hnswlib(monkeypatch)
    monkeypatch.setenv("VSTREAM_SPARK_HNSW_BACKEND", "hnswlib")

    rng = np.random.RandomState(7)
    vecs = rng.rand(300, 16).astype(np.float32)
    labels = np.arange(300)
    ts = np.arange(300)
    idx = build_index(vecs, labels, ts, metric="l2")
    assert isinstance(idx, NativeHnswIndex)

    # exact contract vs brute force (fake backend is brute force, so the
    # adapter's filtering/tie-break is what's under test)
    q = rng.rand(16)
    d = ((vecs.astype(np.float64) - q) ** 2).sum(axis=1)
    truth = np.lexsort((labels, d))[:5]
    got, gd = idx.search(q, 5)
    assert got.tolist() == truth.tolist()
    assert all(gd[i] <= gd[i + 1] for i in range(len(gd) - 1))

    # freshness filter + tombstone via the same adapter surface
    got_fresh, _ = idx.search(q, 5, min_ts=250)
    assert all(lb >= 250 for lb in got_fresh.tolist())
    idx.mark_deleted(int(truth[0]))
    got_del, _ = idx.search(q, 5)
    assert int(truth[0]) not in got_del.tolist()

    # artifact roundtrip through the SHARED loader entry point
    # (HnswIndex.loads dispatches on the payload's backend tag)
    blob = idx.dumps()
    back = HnswIndex.loads(blob)
    assert isinstance(back, NativeHnswIndex)
    got2, _ = back.search(q, 5)
    assert got2.tolist() == got_del.tolist()


def test_native_backend_segment_call_site_contract(monkeypatch):
    """The segment build+search path pokes the index beyond search():
    tombstone shadowing does ``idx._by_label.get / idx.ts[i] /
    idx.mark_delete`` (storage/segments.py, storage/search.py) and the
    neighbor-ts emit does ``idx.ts[idx._by_label[lb]]``
    (storage/search.py). r10 ADVICE: the adapter lacked all three, so the
    native backend crashed at exactly those sites. Pin the full contract —
    including the live-count clamp against hnswlib's k-too-large
    RuntimeError and re-added-label slot reuse."""
    import numpy as np

    from vstream_spark.index.hnsw import HnswIndex, build_index
    from vstream_spark.index.native import NativeHnswIndex

    _install_fake_hnswlib(monkeypatch)
    monkeypatch.setenv("VSTREAM_SPARK_HNSW_BACKEND", "hnswlib")

    rng = np.random.RandomState(11)
    vecs = rng.rand(50, 8).astype(np.float32)
    labels = np.arange(50)
    ts = np.arange(100, 150)
    idx = build_index(vecs, labels, ts, metric="l2")
    assert isinstance(idx, NativeHnswIndex)

    # 1) the EXACT tombstone-shadow sequence the flush/search sites run
    #    (delete marker strictly newer than the insert kills it)
    for del_id, del_time in [(3, 104), (7, 108), (9, 50)]:
        i = idx._by_label.get(int(del_id))
        if i is not None and int(del_time) > int(idx.ts[i]):
            idx.mark_delete(int(del_id))
    q = rng.rand(8)
    got, _ = idx.search(q, 50)
    got = set(got.tolist())
    assert 3 not in got and 7 not in got
    assert 9 in got  # marker at ts=50 is OLDER than insert ts=109: survives

    # 2) the neighbor-ts lookup the search site emits per result label,
    #    plus the neutral accessor
    for lb in got:
        assert int(idx.ts[idx._by_label[int(lb)]]) == 100 + lb
        assert idx.get_ts(lb) == 100 + lb

    # 3) live-count clamp: tombstone down to 5 live, ask for 10 — real
    #    hnswlib (and the fake) raises if k > retrievable; the clamp must
    #    prevent that and the double-count bug must not inflate live
    for lb in range(45):
        idx.mark_delete(lb)
    idx.add_point(vecs[45], 45, 145)  # re-add existing: reuses slot
    assert idx.n == 50 and idx.live == 5
    got5, _ = idx.search(q, 10)
    assert sorted(got5.tolist()) == [45, 46, 47, 48, 49]

    # 4) the contract survives the artifact roundtrip (single unpickle
    #    path through the shared loader)
    back = HnswIndex.loads(idx.dumps())
    assert isinstance(back, NativeHnswIndex)
    assert back.live == 5 and back.n == 50
    assert back.get_ts(46) == 146
    assert back.ts[back._by_label[47]] == 147
    got_b, _ = back.search(q, 10)
    assert sorted(got_b.tolist()) == [45, 46, 47, 48, 49]


def test_numpy_backend_remains_default(monkeypatch):
    """The native backend is opt-in only: without the env var (even if
    hnswlib IS importable) build_index returns the deterministic numpy
    index the hash-matched queries are pinned against."""
    import numpy as np

    from vstream_spark.index.hnsw import HnswIndex, build_index

    _install_fake_hnswlib(monkeypatch)
    monkeypatch.delenv("VSTREAM_SPARK_HNSW_BACKEND", raising=False)
    vecs = np.random.RandomState(3).rand(50, 8).astype(np.float32)
    idx = build_index(vecs, np.arange(50))
    assert isinstance(idx, HnswIndex)


def test_native_duplicate_label_within_one_batch(monkeypatch):
    """A micro-batch can carry the same id twice (StreamingVectorIngest
    flushes raw append batches with no per-id dedup): the first occurrence
    of a NEW label registers a slot past the current sidecar end, so the
    second occurrence's in-place ts update used to IndexError. Last
    occurrence must win, matching hnswlib add_items' in-place update and
    the numpy index's upsert semantics."""
    import numpy as np

    from vstream_spark.index.native import build_native_index

    _install_fake_hnswlib(monkeypatch)
    rng = np.random.RandomState(5)
    vecs = rng.rand(4, 8).astype(np.float32)
    # label 5 appears twice in ONE batch (fresh index — no prior slot)
    idx = build_native_index(
        vecs, labels=[5, 5, 6, 7], ts=[100, 200, 300, 400], metric="l2"
    )
    assert idx.n == 3 and idx.live == 3
    assert idx.get_ts(5) == 200  # last occurrence won
    got, _ = idx.search(vecs[1], 3)
    assert 5 in got.tolist()
    # the winning VECTOR is the last one too (in-place update)
    lbs, ds = idx.search(vecs[1], 1)
    assert lbs.tolist() == [5] and ds[0] < 1e-12


def test_native_dumps_with_tombstones_under_strict_get_items(monkeypatch):
    """Real hnswlib's get_items raises 'Label not found' for marked-deleted
    elements, so dumps() must not ask for them: tombstones persist as
    (label, ts) bookkeeping only, and the restored index keeps the full
    tombstone contract (shadow checks, get_ts, re-add) without graph
    entries for them."""
    import numpy as np

    from vstream_spark.index.hnsw import HnswIndex
    from vstream_spark.index.native import NativeHnswIndex, build_native_index

    _install_fake_hnswlib(monkeypatch)
    rng = np.random.RandomState(6)
    vecs = rng.rand(10, 8).astype(np.float32)
    idx = build_native_index(vecs, np.arange(10), ts=np.arange(100, 110))
    for lb in (2, 4):
        assert idx.mark_delete(lb)
    blob = idx.dumps()  # would raise under real hnswlib before the fix
    back = HnswIndex.loads(blob)
    assert isinstance(back, NativeHnswIndex)
    assert back.n == 10 and back.live == 8
    # tombstone bookkeeping survives without vectors
    assert back.get_ts(2) == 102 and back.get_ts(4) == 104
    assert back.mark_delete(2)  # idempotent re-delete must not crash
    got, _ = back.search(vecs[0], 10)
    assert 2 not in got.tolist() and 4 not in got.tolist()
    # a restored (graphless) tombstone can be RE-ADDED and becomes
    # searchable again — and a second roundtrip stays consistent
    back.add_point(vecs[2], 2, 500)
    assert back.live == 9 and back.get_ts(2) == 500
    lbs, ds = back.search(vecs[2], 1)
    assert lbs.tolist() == [2] and ds[0] < 1e-12
    back2 = HnswIndex.loads(back.dumps())
    assert back2.live == 9 and back2.get_ts(2) == 500
    got2, _ = back2.search(vecs[2], 9)
    assert 2 in got2.tolist() and 4 not in got2.tolist()


def test_allow_filter_in_traversal_matches_exact():
    """In-index attribute filtering (the FilterSeqTs-functor analog,
    hnswlib.h:135-146): with an allowlist threaded into the level-0 walk
    and ef >= n, the filtered beam search is exhaustive over the connected
    graph — results equal the brute-force top-k over allowed labels, with
    the (distance, label) tiebreak, and never contain a disallowed label."""
    vecs, labels = _data(n=300)
    idx = build_index(vecs, labels, M=16, ef_construction=128)
    allow = labels[labels % 3 == 0]
    rng = np.random.RandomState(11)
    queries = rng.rand(15, vecs.shape[1])
    res = idx.search_batch(queries, 10, ef_search=300, allow_labels=allow)
    aset = set(allow.tolist())
    for q, (lbs, ds) in zip(queries, res):
        assert set(lbs) <= aset
        assert list(ds) == sorted(ds)
        want = _exact_topk(vecs[allow], allow, q, 10)
        assert list(lbs) == list(want)


def test_allow_composes_with_tombstones_and_freshness():
    vecs, labels = _data(n=200)
    ts = np.arange(200, dtype=np.int64)
    idx = build_index(vecs, labels, ts=ts, M=16, ef_construction=128)
    idx.mark_delete(30)  # allowed label, tombstoned
    allow = labels[labels % 2 == 0]
    q = vecs[0].astype(np.float64)
    lbs, _ = idx.search(q, 20, ef_search=200, min_ts=20,
                        allow=idx._allow_mask(allow))
    assert 30 not in lbs  # deleted never returns, even when allowed
    assert all(lb % 2 == 0 and lb >= 20 for lb in lbs)
    # NOTE: the right expectation is filter-DURING-walk (top-k over the
    # eligible subset), not global-top-k-then-filter — the whole point of
    # in-traversal eligibility is that those two differ.
    got_exact = _exact_topk(
        vecs[allow], allow, q, 20, min_ts=20, ts=ts[allow], deleted=(30,)
    )
    assert list(lbs) == list(got_exact)


def test_allow_no_eligible_returns_empty():
    vecs, labels = _data(n=100)
    idx = build_index(vecs, labels)
    res = idx.search_batch(vecs[:3], 5, ef_search=100,
                           allow_labels=np.array([10_000], dtype=np.int64))
    assert all(len(lbs) == 0 for lbs, _ in res)


def test_allow_none_path_unchanged():
    """allow_labels=None must route through the legacy unfiltered search
    byte-identically (the hot path the hash-matched gates stand on)."""
    vecs, labels = _data(n=250)
    idx = build_index(vecs, labels)
    rng = np.random.RandomState(13)
    for q in rng.rand(10, vecs.shape[1]):
        a_l, a_d = idx.search(q, 10, ef_search=64)
        b = idx.search_batch(q[None, :], 10, ef_search=64, allow_labels=None)
        assert list(a_l) == list(b[0][0]) and list(a_d) == list(b[0][1])


def test_ts_in_traversal_fills_k_where_post_hoc_underfills():
    """FilterSeqTs parity (hnswlib.h:135-146): with a hard freshness bound
    leaving few eligible nodes, the legacy post-hoc filter drops stale
    nodes AFTER they occupied ef result slots — the result can under-fill
    k. In-traversal ts filtering routes through stale nodes but fills the
    heap with eligible ones only, returning the exact fresh top-k."""
    vecs, labels = _data(n=400)
    ts = np.arange(400, dtype=np.int64)
    idx = build_index(vecs, labels, ts=ts, M=16, ef_construction=128)
    min_ts = 380  # only 20 eligible nodes
    k, ef = 10, 16
    rng = np.random.RandomState(21)
    underfilled = 0
    for q in rng.rand(20, vecs.shape[1]):
        legacy, _ = idx.search(q, k, ef_search=ef, min_ts=min_ts)
        strict, sd = idx.search(
            q, k, ef_search=ef, min_ts=min_ts, ts_in_traversal=True
        )
        underfilled += len(legacy) < k
        assert len(strict) == k
        assert all(lb >= min_ts for lb in strict)
        assert list(sd) == sorted(sd)
        # exact against brute force over the fresh subset (walk covers the
        # whole component once eligible count < ef)
        want = _exact_topk(vecs, labels, q, k, min_ts=min_ts, ts=ts)
        assert list(strict) == list(want)
    assert underfilled > 0  # the gap is real on this data/ef, not vacuous


def test_ts_in_traversal_noop_without_bound():
    vecs, labels = _data(n=200)
    idx = build_index(vecs, labels)
    rng = np.random.RandomState(2)
    for q in rng.rand(5, vecs.shape[1]):
        a = idx.search(q, 10, ef_search=64)
        b = idx.search(q, 10, ef_search=64, ts_in_traversal=True)
        assert list(a[0]) == list(b[0]) and list(a[1]) == list(b[1])


def test_allow_smaller_than_k_returns_all_eligible():
    """Eligible population below k: the beam clamps to n_eligible (the
    heap can hold every eligible node), returns exactly those — no
    exhaustive-walk blowup, no phantom fill."""
    vecs, labels = _data(n=300)
    idx = build_index(vecs, labels)
    allow = np.array([5, 50, 500_000], dtype=np.int64)  # 2 real, 1 unknown
    res = idx.search_batch(vecs[:4], 10, ef_search=64, allow_labels=allow)
    for lbs, _ in res:
        assert sorted(lbs) == [5, 50]
