"""Space-filling curves (P6 of SURVEY §2.3, ``partitioner/curve/``).

Standard public algorithms re-implemented for the engine (NOT ports): Hilbert
via Skilling's transpose algorithm, Z-order via bit interleave (reference
``ZOrderCurve.java:81-139`` does the same interleave), Gray = Z-order index
Gray-coded, Peano via base-3 digit interleave with reflection. Each maps an
n-dim point with ``bits`` of resolution per axis to a scalar index on a
locality-preserving total order — that order is what the dynamic equi-depth
partitioner quantiles over, so any consistent locality-preserving bijection
is semantically sufficient.

Inputs are integer coordinate arrays (N, ndim) in [0, 2^bits); outputs are
Python-int object arrays (indices can exceed 63 bits for ndim*bits > 63,
matching the reference's BigInteger, ``SpaceFillingCurve.java:6-23``).
"""

from __future__ import annotations

import numpy as np


def _as_coords(coords: np.ndarray) -> np.ndarray:
    c = np.asarray(coords)
    if c.ndim == 1:
        c = c[None, :]
    return c.astype(object)


def zorder_index(coords: np.ndarray, bits: int) -> np.ndarray:
    """Bit-interleaved Morton index. coords: (N, ndim) ints in [0, 2^bits)."""
    c = _as_coords(coords)
    n, ndim = c.shape
    out = np.zeros(n, dtype=object)
    for b in range(bits):
        for d in range(ndim):
            out |= ((c[:, d] >> b) & 1) << (b * ndim + d)
    return out


def gray_index(coords: np.ndarray, bits: int) -> np.ndarray:
    """Morton index passed through a binary-reflected Gray code."""
    z = zorder_index(coords, bits)
    return np.array([int(v) ^ (int(v) >> 1) for v in z], dtype=object)


def hilbert_index(coords: np.ndarray, bits: int) -> np.ndarray:
    """Hilbert curve index (Skilling 2004 transpose algorithm), n-dim.

    Row-vectorized: the per-row Python loop was the last ingest-side hot
    loop in the partitioner UDF (r4 What's-wrong #5). All bit ops run as
    numpy elementwise operations over object-dtype columns (indices exceed
    63 bits when ndim*bits > 63), so cost scales with O(bits*ndim) array
    passes instead of O(rows) Python iterations. Values are identical to
    the scalar ``_hilbert_one`` (pinned by tests)."""
    c = _as_coords(coords)
    n, ndim = c.shape
    x = [c[:, d].copy() for d in range(ndim)]
    m = 1 << (bits - 1)
    # Inverse undo excess work (Skilling's AxestoTranspose)
    q = m
    while q > 1:
        p = q - 1
        for i in range(ndim):
            mask = (x[i] & q) != 0
            if i == 0:
                x[0] = np.where(mask, x[0] ^ p, x[0])
            else:
                t = np.where(mask, 0, (x[0] ^ x[i]) & p)
                x[0] = np.where(mask, x[0] ^ p, x[0] ^ t)
                x[i] = x[i] ^ t
        q >>= 1
    for i in range(1, ndim):
        x[i] = x[i] ^ x[i - 1]
    t = np.zeros(n, dtype=object)
    q = m
    while q > 1:
        mask = (x[ndim - 1] & q) != 0
        t = np.where(mask, t ^ (q - 1), t)
        q >>= 1
    for i in range(ndim):
        x[i] = x[i] ^ t
    # Interleave transposed bits into a single index (MSB first across dims)
    h = np.zeros(n, dtype=object)
    for b in range(bits - 1, -1, -1):
        for i in range(ndim):
            h = (h << 1) | ((x[i] >> b) & 1)
    return h


def _hilbert_one(point: list[int], bits: int) -> int:
    x = list(point)
    ndim = len(x)
    # Inverse undo excess work (Skilling's AxestoTranspose)
    m = 1 << (bits - 1)
    q = m
    while q > 1:
        p = q - 1
        for i in range(ndim):
            if x[i] & q:
                x[0] ^= p
            else:
                t = (x[0] ^ x[i]) & p
                x[0] ^= t
                x[i] ^= t
        q >>= 1
    for i in range(1, ndim):
        x[i] ^= x[i - 1]
    t = 0
    q = m
    while q > 1:
        if x[ndim - 1] & q:
            t ^= q - 1
        q >>= 1
    for i in range(ndim):
        x[i] ^= t
    # Interleave transposed bits into a single index (MSB first across dims)
    h = 0
    for b in range(bits - 1, -1, -1):
        for i in range(ndim):
            h = (h << 1) | ((x[i] >> b) & 1)
    return h


def peano_index(coords: np.ndarray, bits: int) -> np.ndarray:
    """Peano curve: base-3 digit interleave with parity reflection.

    Resolution: coordinates are first rescaled from [0, 2^bits) onto
    [0, 3^levels) with levels = ceil(bits * log3(2)) so the ternary grid at
    least matches the binary resolution.
    """
    c = _as_coords(coords)
    n, ndim = c.shape
    levels = max(1, int(np.ceil(bits * np.log(2) / np.log(3))))
    side2 = 1 << bits
    side3 = 3**levels
    # row-vectorized (same values as the scalar _peano_one, pinned by
    # tests): ternary digits, reflection parity and the running index are
    # all elementwise object/int column ops
    pt = [c[:, d] * side3 // side2 for d in range(ndim)]
    idx = np.zeros(n, dtype=object)
    flip = [np.zeros(n, dtype=np.int64) for _ in range(ndim)]
    for l in range(levels):
        tpow = 3 ** (levels - 1 - l)
        for d in range(ndim):
            dig = (pt[d] // tpow) % 3
            dig = np.where(flip[d] % 2 == 1, 2 - dig, dig)
            idx = idx * 3 + dig
            # digits 0/2 keep orientation, digit 1 reflects subsequent axes
            is1 = (dig == 1).astype(np.int64)
            for d2 in range(ndim):
                if d2 != d:
                    flip[d2] += is1
    return idx


def _peano_one(pt: list[int], ndim: int, levels: int) -> int:
    # ternary digits, most significant first
    digits = [[(p // (3 ** (levels - 1 - l))) % 3 for l in range(levels)] for p in pt]
    idx = 0
    flip = [0] * ndim  # reflection parity per axis
    for l in range(levels):
        for d in range(ndim):
            dig = digits[d][l]
            if flip[d] % 2 == 1:
                dig = 2 - dig
            idx = idx * 3 + dig
            # digits 0/2 keep orientation, digit 1 reflects subsequent axes
            if dig == 1:
                for d2 in range(ndim):
                    if d2 != d:
                        flip[d2] += 1
    return idx


def sierpinski_index(coords: np.ndarray, bits: int) -> np.ndarray:
    """Sierpinski curve index by recursive triangle bisection (2-D).

    The unit square is split along the main diagonal into two right isoceles
    triangles; each triangle (entry E, exit X, right-angle R) bisects at the
    hypotenuse midpoint M into (E -> R, right angle M) then (R -> X, right
    angle M), appending one bit per level. 2*bits levels resolve the 2^bits
    grid. Like the reference's ``SierpinskiCurve`` this is a 2-D curve; for
    higher-dimensional sketches only the first two coordinates participate.
    """
    c = _as_coords(coords)
    n = c.shape[0]
    side = 1 << bits
    out = np.empty(n, dtype=object)
    for i in range(n):
        px = (int(c[i, 0]) + 0.5) / side
        py = (int(c[i, 1]) + 0.5) / side if c.shape[1] > 1 else px
        out[i] = _sierpinski_one(px, py, 2 * bits)
    return out


def _sierpinski_one(px: float, py: float, levels: int) -> int:
    # first bit: which side of the main diagonal (lower triangle runs
    # (0,0)->(1,1) with right angle (1,0); upper runs (1,1)->(0,0), r.a. (0,1))
    if py <= px:
        idx, (ex, ey), (xx, xy), (rx, ry) = 0, (0.0, 0.0), (1.0, 1.0), (1.0, 0.0)
    else:
        idx, (ex, ey), (xx, xy), (rx, ry) = 1, (1.0, 1.0), (0.0, 0.0), (0.0, 1.0)
    for _ in range(levels):
        mx, my = (ex + xx) / 2.0, (ey + xy) / 2.0
        # side of the split line R-M: compare sign against the entry vertex
        sp = (mx - rx) * (py - ry) - (my - ry) * (px - rx)
        se = (mx - rx) * (ey - ry) - (my - ry) * (ex - rx)
        if sp * se >= 0:  # same side as E -> first sub-triangle E -> R
            idx, (xx, xy), (rx, ry) = idx * 2, (rx, ry), (mx, my)
        else:  # second sub-triangle R -> X
            idx, (ex, ey), (rx, ry) = idx * 2 + 1, (rx, ry), (mx, my)
    return idx


CURVES = {
    "hilbert": hilbert_index,
    "zorder": zorder_index,
    "gray": gray_index,
    "peano": peano_index,
    "sierpinski": sierpinski_index,
}
