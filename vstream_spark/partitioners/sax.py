"""SAX symbolization + Odyssey-style replication-group partitioning (P8).

Reference semantics (``partitioner/OdysseyPartitionFunction.java:160-329``,
``partitioner/sax/SAX.java:198-279``, ``partitioner/sax/HotTracer.java:288-320``):

* a vector is symbolized to a **SAX word** — z-normalize, piecewise-aggregate
  (PAA) down to ``w`` segment means, quantize each mean against Gaussian
  equi-probable breakpoints into an ``alphabet``-ary symbol, gray-code the
  symbols;
* partitions are organized into **replication groups** of
  ``replication_factor`` workers; a word's records go to one group and are
  **replicated to every worker in that group**;
* **hot words** (the top-λ most frequent, tracked per window) are spread
  across groups record-by-record instead of pinned to one group (skew relief —
  the same treatment the reference applies to groups exceeding
  ``skewFactor``×avg);
* a **query visits one worker per group** (round-robin in the reference;
  deterministic qid-hash here) — complete because every group holds its words
  on every member, so the pipeline is EXACT while spreading query load across
  group members.

Spark-first re-expression: the word is a vectorized pandas UDF; the hot set is
a ``groupBy(word).count()`` top-λ collected to a tiny broadcastable frozenset
(the batch analog of HotTracer's sliding window); group routing + member
replication is an exploded ``partition_id`` array, exactly like the LSH
partitioners. No driver-side iteration over data.
"""

from __future__ import annotations

import numpy as np

# Equi-probable N(0,1) breakpoints for alphabet sizes 2..10 (standard SAX
# lookup table — quantiles of the normal distribution).
_SAX_CUTS: dict[int, list[float]] = {
    2: [0.0],
    3: [-0.43, 0.43],
    4: [-0.67, 0.0, 0.67],
    5: [-0.84, -0.25, 0.25, 0.84],
    6: [-0.97, -0.43, 0.0, 0.43, 0.97],
    7: [-1.07, -0.57, -0.18, 0.18, 0.57, 1.07],
    8: [-1.15, -0.67, -0.32, 0.0, 0.32, 0.67, 1.15],
    9: [-1.22, -0.76, -0.43, -0.14, 0.14, 0.43, 0.76, 1.22],
    10: [-1.28, -0.84, -0.52, -0.25, 0.0, 0.25, 0.52, 0.84, 1.28],
}


def sax_words(mat: np.ndarray, word_len: int, alphabet: int) -> np.ndarray:
    """Vectorized SAX: (N, dim) float matrix -> (N,) int64 gray-coded words.

    znorm per row -> PAA to ``word_len`` segment means -> symbol per segment
    via Gaussian breakpoints -> gray code packed base-``alphabet`` style into
    one int (bit-packed: ceil(log2(alphabet)) bits per symbol).
    """
    if alphabet not in _SAX_CUTS:
        raise ValueError(f"alphabet must be in {sorted(_SAX_CUTS)}, got {alphabet}")
    n, dim = mat.shape
    w = min(word_len, dim)
    mu = mat.mean(axis=1, keepdims=True)
    sd = mat.std(axis=1, keepdims=True)
    z = np.where(sd > 1e-12, (mat - mu) / np.where(sd > 0, sd, 1.0), 0.0)
    # PAA: mean over contiguous segments (pad-free: segment boundaries by
    # rounding, the standard formulation for dim not divisible by w)
    bounds = (np.arange(w + 1) * dim / w).astype(np.int64)
    paa = np.stack(
        [z[:, bounds[i] : bounds[i + 1]].mean(axis=1) for i in range(w)], axis=1
    )
    cuts = np.asarray(_SAX_CUTS[alphabet])
    syms = np.searchsorted(cuts, paa, side="right").astype(np.int64)  # (N, w)
    gray = syms ^ (syms >> 1)
    bits_per = max(1, int(np.ceil(np.log2(alphabet))))
    word = np.zeros(n, dtype=np.int64)
    for i in range(w):
        word = (word << bits_per) | gray[:, i]
    return word


def group_of_word(words: np.ndarray, num_groups: int, seed: int = 42) -> np.ndarray:
    """Deterministic word -> replication-group routing (the round-robin
    assignment of the reference, made stateless via a seeded mix)."""
    x = words.astype(np.uint64)
    x = (x ^ np.uint64(seed)) * np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(31)
    return (x % np.uint64(num_groups)).astype(np.int64)
