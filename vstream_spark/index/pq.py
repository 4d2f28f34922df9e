"""Product-quantized segment artifact — the memory-bound scale path.

At 100 TB a float32 segment (250k × 128-dim = 128 MB raw) competes with the
executor's working memory; PQ codes (Jégou et al. 2011, the public IVF-PQ
family faiss implements) cut that ~32x: vectors are split into ``m``
subvectors, each quantized to one of 256 per-subspace centroids, and search
runs by Asymmetric Distance Computation — one (m, 256) query table, then a
pure gather+sum over the uint8 code matrix. No float vectors are kept at
query time.

Same worker contract as HnswIndex/IvfIndex (``search``, ``search_batch``,
``mark_delete``, ``ts``, ``_by_label``, ``dumps``/``loads``); the
``ef_search`` knob is ignored (ADC always scans every live code — still
~100x less memory traffic than a float scan). Deterministic: per-subspace
k-means uses the seeded Lloyd from ``index.ivf``; codes and codebooks are
byte-stable for a given input set.

Metrics: 'l2' native ADC; 'ip' via inner-product tables; 'cosine' trains on
unit-normalized vectors and uses the unit-sphere identity
cos_dist = ||u - v||^2 / 2.
"""

from __future__ import annotations

import io
import pickle

import numpy as np


from vstream_spark.index.ivf import _kmeans
from vstream_spark.index.hnsw import _TS_MISSING

_METRICS = ("l2", "ip", "cosine")


class PqIndex:
    """ADC search over uint8 product codes."""

    def __init__(self, dim: int, metric: str = "l2", m: int = 8, nbits: int = 8):
        if metric not in _METRICS:
            raise ValueError(f"metric must be one of {sorted(_METRICS)}")
        if dim % m != 0:
            raise ValueError(f"dim {dim} not divisible by m {m} subvectors")
        if not 1 <= nbits <= 8:
            raise ValueError("nbits must be in [1, 8]")
        self.dim = dim
        self.metric = metric
        self.m = m
        self.nbits = nbits
        self.ksub = 1 << nbits
        self.dsub = dim // m
        # (m, ksub, dsub) per-subspace centroids
        self.codebooks = np.zeros((m, self.ksub, self.dsub), dtype=np.float32)
        self.codes = np.empty((0, m), dtype=np.uint8)
        self.labels = np.empty(0, dtype=np.int64)
        self.ts = np.empty(0, dtype=np.int64)
        self.deleted = np.zeros(0, dtype=bool)
        self.n = 0
        self._by_label: dict[int, int] = {}

    # -- search ---------------------------------------------------------------

    def _adc_table(self, q: np.ndarray) -> np.ndarray:
        """(m, ksub) per-subspace distance contributions for one query."""
        if self.metric == "cosine":
            nq = np.linalg.norm(q)
            if nq > 0:
                q = q / nq
        qs = q.reshape(self.m, self.dsub).astype(np.float32)
        if self.metric == "ip":
            return -np.einsum("mkd,md->mk", self.codebooks, qs)
        # l2 (and cosine on the unit sphere): squared euclidean per subspace
        diff = self.codebooks - qs[:, None, :]
        tab = np.einsum("mkd,mkd->mk", diff, diff)
        return tab / 2.0 if self.metric == "cosine" else tab

    def search(
        self,
        q: np.ndarray,
        k: int,
        ef_search: int | None = None,
        min_ts: int | None = None,
        allow: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Top-k (labels, approx distances) ascending by (distance, label).
        ``allow`` (optional slot-level bool mask) filters rows before the
        ADC gather — the in-index attribute filter (FilterSeqTs analog)."""
        if self.n == 0:
            return np.empty(0, dtype=np.int64), np.empty(0)
        tab = self._adc_table(np.asarray(q, dtype=np.float64))
        ok = ~self.deleted[: self.n]
        if min_ts is not None:
            ok &= self.ts[: self.n] >= min_ts
        if allow is not None:
            ok &= allow
        idx = np.nonzero(ok)[0]
        if len(idx) == 0:
            return np.empty(0, dtype=np.int64), np.empty(0)
        # ADC: gather each row's m table entries and sum
        ds = tab[np.arange(self.m)[None, :], self.codes[idx]].sum(axis=1)
        take = min(k, len(idx))
        top = np.argpartition(ds, take - 1)[:take] if take < len(idx) else np.arange(len(idx))
        order = np.lexsort((self.labels[idx[top]], ds[top]))
        top = top[order]
        return self.labels[idx[top]], ds[top].astype(np.float64)

    def search_batch(
        self, qmat: np.ndarray, k: int, ef_search=None, min_ts=None,
        allow_labels=None, ts_in_traversal: bool = False,
    ):
        # ts_in_traversal accepted for worker-surface parity, ignored: the
        # ADC scan already filters min_ts before top-k selection
        allow = None
        if allow_labels is not None:
            from vstream_spark.index.hnsw import allow_mask

            allow = allow_mask(self.labels[: self.n], allow_labels)
        out = []
        for j in range(qmat.shape[0]):
            mt = None
            if min_ts is not None:
                mt = int(min_ts[j]) if np.ndim(min_ts) else int(min_ts)
            out.append(self.search(qmat[j], k, ef_search, mt, allow=allow))
        return out

    # -- mutation -------------------------------------------------------------

    def mark_delete(self, label: int) -> bool:
        i = self._by_label.get(label)
        if i is None:
            return False
        self.deleted[i] = True
        return True

    def get_ts(self, label: int, default=_TS_MISSING):
        """Event-time of a label (neutral accessor shared across index
        kinds, so segment call sites need no layout-specific poking).
        Returns ``default`` for unknown labels when given, else KeyError."""
        slot = self._by_label.get(int(label))
        if slot is None:
            if default is _TS_MISSING:
                raise KeyError(label)
            return default
        return int(self.ts[slot])

    # -- persistence ----------------------------------------------------------

    def dumps(self) -> bytes:
        buf = io.BytesIO()
        pickle.dump(
            {
                "dim": self.dim, "metric": self.metric, "m": self.m,
                "nbits": self.nbits, "codebooks": self.codebooks,
                "codes": self.codes, "labels": self.labels, "ts": self.ts,
                "deleted": self.deleted,
            },
            buf,
            protocol=4,
        )
        return buf.getvalue()

    @classmethod
    def loads(cls, data: bytes) -> "PqIndex":
        d = pickle.loads(data)
        idx = cls(d["dim"], d["metric"], d["m"], d["nbits"])
        idx.codebooks = d["codebooks"]
        idx.codes = d["codes"]
        idx.labels = d["labels"]
        idx.ts = d["ts"]
        idx.deleted = d["deleted"]
        idx.n = len(idx.labels)
        idx._by_label = {int(lb): i for i, lb in enumerate(idx.labels)}
        return idx

    def memory_bytes(self) -> int:
        """Code storage only (the float vectors are NOT retained)."""
        return self.codes.nbytes + self.codebooks.nbytes


def build_pq(
    vecs: np.ndarray,
    labels: np.ndarray,
    ts: np.ndarray | None = None,
    metric: str = "l2",
    m: int = 8,
    nbits: int = 8,
    seed: int = 42,
) -> PqIndex:
    """Train per-subspace codebooks and encode the shard. Label-sorted for
    retry determinism (same contract as build_index/build_ivf)."""
    order = np.argsort(labels, kind="stable")
    vecs = np.ascontiguousarray(vecs[order], dtype=np.float64)
    labels = np.asarray(labels)[order]
    ts = (
        np.asarray(ts)[order].astype(np.int64)
        if ts is not None
        else np.zeros(len(labels), dtype=np.int64)
    )
    n = len(labels)
    dim = vecs.shape[1] if vecs.ndim == 2 and n else 0
    if n == 0:
        return PqIndex(max(dim, m), metric, m, nbits)
    idx = PqIndex(dim, metric, m, nbits)
    train = vecs
    if metric == "cosine":
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        train = vecs / np.where(norms > 0, norms, 1.0)
    ksub = min(idx.ksub, n)  # degenerate shards: fewer codes than ksub
    codes = np.zeros((n, m), dtype=np.uint8)
    for s in range(m):
        sub = np.ascontiguousarray(train[:, s * idx.dsub : (s + 1) * idx.dsub])
        cents = _kmeans(sub, ksub, seed + s)
        idx.codebooks[s, :ksub] = cents
        if ksub < idx.ksub:
            # pad unused codes with the first centroid (never assigned)
            idx.codebooks[s, ksub:] = cents[0]
        d = (
            (sub * sub).sum(axis=1)[:, None]
            - 2.0 * (sub @ cents.T)
            + (cents * cents).sum(axis=1)[None, :]
        )
        codes[:, s] = d.argmin(axis=1).astype(np.uint8)
    idx.codes = codes
    idx.labels = labels
    idx.ts = ts
    idx.deleted = np.zeros(n, dtype=bool)
    idx.n = n
    idx._by_label = {int(lb): i for i, lb in enumerate(labels)}
    return idx
