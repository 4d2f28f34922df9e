"""Optional native HNSW backend adapter (hnswlib), behind the one-class seam.

SCALE.md's posture note says the numpy HNSW "is slower to build than
hnswlib's C++ (same asymptotics, bigger constant) — the seam is one class;
swapping in hnswlib/faiss where available changes no operator code". This
module makes that claim a TESTED seam instead of an assertion (r9 VERDICT
stretch #8): ``build_index`` (vstream_spark/index/hnsw.py) dispatches here
when the backend is selected, and the adapter exposes exactly the interface
every operator consumes — ``search``, ``search_batch``, ``dumps``/``loads``
— so no call site changes.

Backend selection (``VSTREAM_SPARK_HNSW_BACKEND``):
  - ``numpy`` (default): the from-scratch deterministic index. This stays
    the default even when hnswlib IS importable — the declared queries'
    recall gates are pinned against the numpy graph's exact construction
    order, and a silent backend switch would change recall-sensitive
    results between environments.
  - ``hnswlib``: the native C++ graph via this adapter; raises ImportError
    with a clear message when the library is absent.

The adapter reproduces the engine-contract parts hnswlib lacks natively by
keeping sidecar arrays, the same way the reference patched hnswlib for its
engine contract (freshness filter ``FilterSeqTs``, hnswlib.h:135-146;
tombstones via markDelete):
  - per-label event-time ``ts`` + ``min_ts`` freshness filtering (passed as
    an hnswlib ``filter`` callable),
  - tombstones (hnswlib's ``mark_deleted``; the filter also guards them so
    backends without deleted-skip in ``knn_query`` stay correct),
  - (distance asc, label asc) tie-break identical to the numpy index.

Determinism note: hnswlib's graph construction is only reproducible
single-threaded with a fixed seed; the adapter builds with one thread. The
numpy backend remains the hash-matched reference — ``hnswlib`` mode trades
bit-stability of RECALL-DEPENDENT outputs for build speed, which is the
documented reason it is opt-in.
"""

from __future__ import annotations

import importlib
import io
import os
import pickle

import numpy as np

# hnsw.py imports this module only lazily (build_index dispatch), so the
# module-level sentinel import is cycle-free
from vstream_spark.index.hnsw import _TS_MISSING

_ENV = "VSTREAM_SPARK_HNSW_BACKEND"

# hnswlib space name per engine metric; distances returned by hnswlib are
# already the engine's conventions for l2 (squared) and must be re-derived
# for ip/cosine (hnswlib returns 1 - ip and 1 - cos as "distances")
_SPACES = {"l2": "l2", "ip": "ip", "cosine": "cosine"}



def backend_name() -> str:
    """The selected backend: contents of $VSTREAM_SPARK_HNSW_BACKEND
    (default ``numpy``)."""
    return os.environ.get(_ENV, "numpy").strip().lower() or "numpy"


def native_selected() -> bool:
    """True when the env selects the native backend. Selection is EXPLICIT
    (never auto-on-importable): see the module docstring's determinism
    note."""
    return backend_name() == "hnswlib"


def _hnswlib(reason: str | None = None):
    try:
        return importlib.import_module("hnswlib")
    except ImportError as e:  # pragma: no cover - env-dependent message
        raise ImportError(
            reason
            or (
                f"{_ENV}=hnswlib but the hnswlib package is not importable; "
                "install hnswlib or unset the variable to use the built-in "
                "numpy index"
            )
        ) from e


class NativeHnswIndex:
    """hnswlib-backed index with the exact operator-facing interface of
    :class:`vstream_spark.index.hnsw.HnswIndex` — not just search /
    search_batch / dumps / loads, but also the positional sidecars the
    segment call sites consume directly (``storage/segments.py`` tombstone
    shadowing, ``storage/search.py`` neighbor-ts lookup): ``ts`` array,
    ``_by_label`` dict, ``labels`` array, ``mark_delete(label) -> bool``,
    ``get_ts(label)``."""

    def __init__(
        self,
        dim: int,
        metric: str = "l2",
        M: int = 16,
        ef_construction: int = 128,
        seed: int = 42,
        capacity: int = 1024,
    ):
        if metric not in _SPACES:
            raise ValueError(f"metric must be one of {sorted(_SPACES)}")
        self.dim = dim
        self.metric = metric
        self.M = M
        self.ef_construction = ef_construction
        self.seed = seed
        lib = _hnswlib()
        self._idx = lib.Index(space=_SPACES[metric], dim=dim)
        self._idx.init_index(
            max_elements=max(1, capacity),
            M=M,
            ef_construction=ef_construction,
            random_seed=seed,
        )
        if hasattr(self._idx, "set_num_threads"):
            self._idx.set_num_threads(1)  # reproducible builds
        # sidecars for the engine contract (freshness + tombstones), in the
        # numpy index's POSITIONAL layout so segment call sites that poke
        # idx.ts[idx._by_label[lb]] / idx.mark_delete(lb) work unchanged on
        # either backend; mirrors what the reference stores per sequence
        # number (FilterSeqTs, hnswlib.h:135-146)
        self.labels = np.empty(0, dtype=np.int64)
        self.ts = np.empty(0, dtype=np.int64)
        self._by_label: dict[int, int] = {}
        self._deleted: set[int] = set()
        # tombstones restored from an artifact have NO graph element (their
        # vectors are gone — hnswlib's get_items raises on deleted labels,
        # so dumps() cannot persist them); graph calls must skip these
        self._graphless: set[int] = set()
        self.n = 0  # distinct slots (re-added labels reuse their slot)

    @property
    def live(self) -> int:
        """Number of retrievable (non-tombstoned) elements — the hard cap
        hnswlib.knn_query can return without raising."""
        return self.n - len(self._deleted)

    def get_ts(self, label: int, default=_TS_MISSING):
        """Event-time of a label (neutral accessor, both backends). Returns
        ``default`` for unknown labels when given, else KeyError."""
        slot = self._by_label.get(int(label))
        if slot is None:
            if default is _TS_MISSING:
                raise KeyError(label)
            return default
        return int(self.ts[slot])

    # -- build ----------------------------------------------------------------

    def add_batch(self, vecs, labels, ts=None) -> None:
        vecs = np.ascontiguousarray(vecs, dtype=np.float32)
        labels = np.asarray(labels, dtype=np.int64)
        if ts is None:
            ts = np.zeros(len(labels), dtype=np.int64)
        batch = {int(lb) for lb in labels}
        # graph growth = labels new to the sidecars + graphless tombstones
        # being re-added (their old graph element is gone)
        grow = len(batch - self._by_label.keys()) + len(batch & self._graphless)
        graph_count = self.n - len(self._graphless)
        cap = getattr(self._idx, "get_max_elements", lambda: None)()
        if cap is not None and graph_count + grow > cap:
            self._idx.resize_index(graph_count + grow)
        # re-adding a tombstoned label that still HAS a graph element must
        # clear hnswlib's internal deleted flag first — knn_query skips
        # internally-deleted elements regardless of the filter, so add_items
        # alone would leave the updated point unreachable
        if hasattr(self._idx, "unmark_deleted"):
            for lb in sorted(batch & self._deleted - self._graphless):
                self._idx.unmark_deleted(lb)
        self._idx.add_items(vecs, labels)  # existing label = in-place update
        new_lbs, new_ts = [], []
        for lb, t in zip(labels, ts):
            lb = int(lb)
            slot = self._by_label.get(lb)
            if slot is None:
                self._by_label[lb] = self.n + len(new_lbs)
                new_lbs.append(lb)
                new_ts.append(int(t))
            elif slot < self.n:
                self.ts[slot] = int(t)
            else:
                # same NEW label twice in ONE batch: its slot is still
                # PENDING (the sidecar arrays are extended only after the
                # loop), so update the pending entry in place — last
                # occurrence wins, matching add_items' in-place update
                new_ts[slot - self.n] = int(t)
            self._deleted.discard(lb)
            self._graphless.discard(lb)
        if new_lbs:
            self.labels = np.concatenate(
                [self.labels, np.asarray(new_lbs, dtype=np.int64)]
            )
            self.ts = np.concatenate(
                [self.ts, np.asarray(new_ts, dtype=np.int64)]
            )
            self.n += len(new_lbs)

    def add_point(self, vec, label: int, ts: int = 0) -> None:
        self.add_batch(
            np.asarray(vec, dtype=np.float32)[None, :],
            np.asarray([label], dtype=np.int64),
            np.asarray([ts], dtype=np.int64),
        )

    def mark_delete(self, label: int) -> bool:
        """Tombstone a label — same name/return contract as the numpy
        index's ``mark_delete`` (the segment call sites use this name)."""
        label = int(label)
        if label not in self._by_label:
            return False
        already = label in self._deleted
        self._deleted.add(label)
        # forward to the graph only once and only for labels that HAVE a
        # graph element (real hnswlib raises on unknown or double deletes)
        if (
            not already
            and label not in self._graphless
            and hasattr(self._idx, "mark_deleted")
        ):
            self._idx.mark_deleted(label)
        return True

    def mark_deleted(self, label: int) -> None:
        """hnswlib-style alias for :meth:`mark_delete`."""
        self.mark_delete(label)

    # -- search ---------------------------------------------------------------

    def search(
        self, q, k: int, ef_search: int | None = None, min_ts=None, allow=None
    ):
        """Top-k (labels, distances) ascending by (distance, label) — the
        numpy index's exact contract, including the freshness filter.
        ``allow`` (optional label set) rides the SAME filter functor hnswlib
        threads through graph traversal (``knn_query(filter=...)``) — the
        native backend's in-index attribute filter."""
        if self.live == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
        ef = max(ef_search or self.ef_construction, k)
        if hasattr(self._idx, "set_ef"):
            self._idx.set_ef(ef)

        def _ok(lb: int) -> bool:
            if lb in self._deleted:
                return False
            if allow is not None and lb not in allow:
                return False
            if min_ts is None:
                return True
            slot = self._by_label.get(lb)
            return slot is not None and int(self.ts[slot]) >= int(min_ts)

        q32 = np.ascontiguousarray(q, dtype=np.float32)[None, :]
        # clamp to the LIVE count: hnswlib raises RuntimeError ("Cannot
        # return the results in a contiguous 2D array") when k exceeds the
        # retrievable element count
        want = min(k, self.live)
        try:
            lbs, ds = self._idx.knn_query(q32, k=want, filter=_ok)
        except (TypeError, RuntimeError):
            # older hnswlib without filter=, or a freshness filter that
            # starves the result below `want`: over-fetch and post-filter
            lbs, ds = self._idx.knn_query(q32, k=min(self.live, max(ef, k)))
            keep = [j for j, lb in enumerate(lbs[0]) if _ok(int(lb))]
            lbs, ds = lbs[:, keep], ds[:, keep]
        out = sorted(
            (float(d), int(lb)) for lb, d in zip(lbs[0], ds[0]) if _ok(int(lb))
        )[:k]
        return (
            np.asarray([lb for _, lb in out], dtype=np.int64),
            np.asarray([d for d, _ in out], dtype=np.float64),
        )

    def search_batch(
        self, qmat, k: int, ef_search: int | None = None, min_ts=None,
        allow_labels=None, ts_in_traversal: bool = False,
    ):
        # ts_in_traversal accepted for worker-surface parity, ignored:
        # hnswlib's filter functor already evaluates min_ts IN traversal
        allow = (
            {int(lb) for lb in allow_labels} if allow_labels is not None else None
        )
        out = []
        for j in range(qmat.shape[0]):
            mt = None
            if min_ts is not None:
                mt = int(min_ts) if np.isscalar(min_ts) else int(min_ts[j])
            out.append(self.search(qmat[j], k, ef_search, mt, allow=allow))
        return out

    # -- persistence ------------------------------------------------------------

    def dumps(self) -> bytes:
        """Portable artifact: raw vectors + sidecars (rebuilt on load).

        hnswlib's own binary graph serialization is file-path-only and not
        stable across library versions; the segment artifact must outlive
        both, so the adapter persists the DATA and rebuilds the graph on
        load (build cost is the native backend's cheap axis).

        Tombstoned labels are persisted WITHOUT vectors (``deleted`` +
        ``deleted_ts``): real hnswlib's ``get_items`` raises 'Label not
        found' for marked-deleted elements, so their data is unreadable —
        only the (label, ts) bookkeeping survives, which is all the
        tombstone semantics need."""
        all_ids = self.labels[: self.n]
        all_ts = self.ts[: self.n]
        if self._deleted:
            dead = np.fromiter(self._deleted, dtype=np.int64, count=len(self._deleted))
            keep = ~np.isin(all_ids, dead)
        else:
            keep = np.ones(len(all_ids), dtype=bool)
        ids = all_ids[keep]
        vecs = (
            self._idx.get_items(ids) if len(ids) else np.empty((0, self.dim))
        )
        buf = io.BytesIO()
        pickle.dump(
            {
                "backend": "hnswlib",
                "dim": self.dim,
                "metric": self.metric,
                "M": self.M,
                "ef_construction": self.ef_construction,
                "seed": self.seed,
                "labels": ids.copy(),
                "vecs": np.asarray(vecs, dtype=np.float32),
                "ts": all_ts[keep].copy(),
                "deleted": all_ids[~keep].copy(),
                "deleted_ts": all_ts[~keep].copy(),
            },
            buf,
            protocol=4,
        )
        return buf.getvalue()

    @classmethod
    def from_state(cls, d: dict) -> "NativeHnswIndex":
        """Rebuild from an already-unpickled artifact dict (the shared
        ``HnswIndex.loads`` dispatcher hands the payload through so it is
        unpickled exactly once)."""
        # the ImportError for the artifact-load path must not blame the
        # backend env var — the artifact itself demands the native library
        _hnswlib(
            "this index artifact was built with the hnswlib backend; "
            "install hnswlib to load it (the numpy backend cannot "
            "reconstruct a native graph artifact)"
        )
        idx = cls(
            d["dim"], d["metric"], d["M"], d["ef_construction"], d["seed"],
            capacity=max(1, len(d["labels"])),
        )
        if len(d["labels"]):
            # rebuild in label-sorted order — the same order
            # build_native_index used — so a roundtripped graph is
            # deterministic and matches the original build's structure
            labels = np.asarray(d["labels"], dtype=np.int64)
            order = np.argsort(labels, kind="stable")
            idx.add_batch(
                np.asarray(d["vecs"])[order],
                labels[order],
                np.asarray(d["ts"], dtype=np.int64)[order],
            )
        dels = np.asarray(d.get("deleted", ()), dtype=np.int64)
        del_ts = np.asarray(
            d.get("deleted_ts", np.zeros(len(dels))), dtype=np.int64
        )
        ghost_lbs, ghost_ts = [], []  # batched: one concat, not O(T^2)
        for lb, t in zip(dels, del_ts):
            lb = int(lb)
            if lb in idx._by_label:
                # legacy artifact (tombstones persisted with vectors)
                idx.mark_delete(lb)
                continue
            # sidecar-only tombstone: label + ts bookkeeping, NO graph
            # element (its vector was unreadable at dump time)
            idx._by_label[lb] = idx.n + len(ghost_lbs)
            ghost_lbs.append(lb)
            ghost_ts.append(int(t))
            idx._deleted.add(lb)
            idx._graphless.add(lb)
        if ghost_lbs:
            idx.labels = np.concatenate(
                [idx.labels, np.asarray(ghost_lbs, dtype=np.int64)]
            )
            idx.ts = np.concatenate(
                [idx.ts, np.asarray(ghost_ts, dtype=np.int64)]
            )
            idx.n += len(ghost_lbs)
        return idx

    @classmethod
    def loads(cls, data: bytes) -> "NativeHnswIndex":
        return cls.from_state(pickle.loads(data))


def build_native_index(
    vecs,
    labels,
    ts=None,
    metric: str = "l2",
    M: int = 16,
    ef_construction: int = 128,
    seed: int = 42,
) -> NativeHnswIndex:
    """Native-backend twin of :func:`vstream_spark.index.hnsw.build_index`
    (same signature minus ``bulk`` — the C++ build is already bulk)."""
    labels = np.asarray(labels, dtype=np.int64)
    order = np.argsort(labels, kind="stable")  # same retry determinism
    idx = NativeHnswIndex(
        np.asarray(vecs).shape[1], metric, M, ef_construction, seed,
        capacity=max(1, len(labels)),
    )
    idx.add_batch(
        np.asarray(vecs)[order],
        labels[order],
        np.asarray(ts)[order] if ts is not None else None,
    )
    return idx
