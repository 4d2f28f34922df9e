"""Property-based tests (hypothesis) for the pure-python kernels.

SURVEY §5 notes the reference has no property corpus; we add one for the
deterministic kernels where invariants are crisp: space-filling curves
(bijectivity on the grid), SAX (scale/offset invariance), minhash
(containment monotonicity), HNSW (result ordering + filter soundness).
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from vstream_spark.partitioners.curves import CURVES
from vstream_spark.partitioners.sax import group_of_word, sax_words


@settings(max_examples=25, deadline=None)
@given(st.sampled_from(sorted(CURVES)), st.integers(2, 4))
def test_curves_bijective_on_grid(curve_name, bits):
    curve = CURVES[curve_name]
    side = 1 << bits
    pts = np.array([[x, y] for x in range(side) for y in range(side)], dtype=np.int64)
    idx = curve(pts, bits)
    vals = [int(v) for v in idx]
    assert len(set(vals)) == side * side  # injective on the full grid
    assert min(vals) >= 0


@settings(max_examples=25, deadline=None)
@given(
    st.integers(0, 2**31 - 1),
    st.floats(0.1, 100.0, allow_nan=False),
    st.floats(-50.0, 50.0, allow_nan=False),
)
def test_sax_affine_invariance(seed, scale, shift):
    rng = np.random.RandomState(seed % 2**32)
    mat = rng.rand(20, 16)
    w = sax_words(mat, 8, 4)
    w2 = sax_words(mat * scale + shift, 8, 4)
    assert (w == w2).all()


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(2, 32))
def test_group_of_word_range(seed, groups):
    words = np.arange(-50, 50, dtype=np.int64) * (seed % 97 + 1)
    g = group_of_word(words, groups, seed)
    assert ((g >= 0) & (g < groups)).all()
    # deterministic
    assert (g == group_of_word(words, groups, seed)).all()


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_minhash_containment_monotone(seed):
    """Adding shingles can only lower (or keep) each permutation's min."""
    from vstream_spark.operators.dedup import _minhash_perm_params

    a, b = _minhash_perm_params(16, 42)
    rng = np.random.RandomState(seed % 2**32)
    small = rng.randint(0, 2**60, size=5).astype(np.uint64)
    extra = rng.randint(0, 2**60, size=5).astype(np.uint64)
    big = np.concatenate([small, extra])
    with np.errstate(over="ignore"):
        sig_small = ((a[:, None] * small[None, :] + b[:, None]) >> np.uint64(4)).min(axis=1)
        sig_big = ((a[:, None] * big[None, :] + b[:, None]) >> np.uint64(4)).min(axis=1)
    assert (sig_big <= sig_small).all()


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(1, 8))
def test_hnsw_ordering_and_filter(seed, k):
    from vstream_spark.index.hnsw import build_index

    rng = np.random.RandomState(seed % 2**32)
    n = 60
    vecs = rng.rand(n, 8).astype(np.float32)
    labels = np.arange(n, dtype=np.int64)
    ts = rng.randint(0, 1000, size=n).astype(np.int64)
    idx = build_index(vecs, labels, ts=ts)
    q = rng.rand(8)
    lbs, ds = idx.search(q, k, ef_search=64)
    assert list(ds) == sorted(ds)
    assert len(set(lbs)) == len(lbs)
    cut = 500
    lbs_f, _ = idx.search(q, k, ef_search=64, min_ts=cut)
    assert all(ts[lb] >= cut for lb in lbs_f)
