"""p-stable L2 LSH families (P2-P5 of SURVEY §2.3).

Implements the reference's hash formula ``h = floor((a.v + b) / r)`` with
Gaussian ``a`` and uniform ``b in [0, r)`` (``L2Hash.java:35-38``); a family is
``k2`` such hashes (``L2HashFamily.java:89-95``), and ``k1`` independent
families replicate data for recall (``LSHPartitionFunction.java:109-164``).
Data goes to ``combine(hash_values) mod P`` per family; queries use the same
seeded families, which is what makes partition pruning correct (O1): a query
lands exactly where matching data landed.

All hashing is seeded numpy (RandomState(seed * 1000 + family)) — fully
deterministic across executors, retries, and engines. The UDF is a vectorized
pandas UDF over Arrow batches; nothing per-row in Python.
"""

from __future__ import annotations

import numpy as np

from vstream_spark.config import PartitionerConf

_MOD = (1 << 31) - 1  # combine hash modulus (Mersenne prime)


class LSHFamilies:
    """k1 seeded hash families over dim-d vectors."""

    def __init__(self, dim: int, conf: PartitionerConf):
        self.conf = conf
        self.dim = dim
        self.a = []  # (k2, dim) Gaussian per family
        self.b = []  # (k2,) uniform [0, r)
        for fam in range(conf.num_families):
            rng = np.random.RandomState(conf.seed * 1000 + fam)
            self.a.append(rng.normal(0.0, 1.0, size=(conf.num_hashes, dim)))
            self.b.append(rng.uniform(0.0, conf.bucket_width, size=conf.num_hashes))

    def hash_values(self, mat: np.ndarray, family: int) -> np.ndarray:
        """(N, k2) int hash values for one family."""
        proj = mat @ self.a[family].T + self.b[family][None, :]
        return np.floor(proj / self.conf.bucket_width).astype(np.int64)

    def combine(self, hashes: np.ndarray) -> np.ndarray:
        """Deterministic polynomial combine of the k2 ints -> bucket int.

        Polynomial rolling hash mod a Mersenne prime (same role as the
        reference's Arrays.hashCode combine in LSHPartitionFunction.java:138).
        """
        acc = np.zeros(len(hashes), dtype=np.int64)
        for j in range(hashes.shape[1]):
            acc = (acc * 31 + (hashes[:, j] % _MOD)) % _MOD
        return acc

    def partitions(self, mat: np.ndarray, probes: int = 0) -> list[set[int]]:
        """Per-row set of partition ids across all families.

        ``probes`` > 0 adds multiprobe fan-out (P4,
        ``LSHProximityPartitionFunction.java:28-223``): each hash value is
        perturbed by ±1..±probes in one position at a time, union of buckets.
        """
        P = self.conf.num_partitions
        out: list[set[int]] = [set() for _ in range(len(mat))]
        for fam in range(self.conf.num_families):
            hv = self.hash_values(mat, fam)
            for perturbed in _perturbations(hv, probes):
                pids = self.combine(perturbed) % P
                for i, p in enumerate(pids):
                    out[i].add(int(p))
        return out


def _perturbations(hv: np.ndarray, probes: int):
    """Yield hv plus single-position +/-delta perturbations (multiprobe)."""
    yield hv
    for delta in range(1, probes + 1):
        for pos in range(hv.shape[1]):
            for sign in (1, -1):
                pert = hv.copy()
                pert[:, pos] += sign * delta
                yield pert
