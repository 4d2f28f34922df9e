"""fvecs/bvecs/ivecs round-trip through the mapInPandas decoders (S1/S6)."""

import struct

import numpy as np
import pytest

from vstream_spark.sources.fvecs import read_bvecs, read_fvecs, read_ivecs


def _write_xvecs(path, arrays, fmt):
    with open(path, "wb") as f:
        for arr in arrays:
            f.write(struct.pack("<i", len(arr)))
            if fmt == "f":
                f.write(np.asarray(arr, dtype="<f4").tobytes())
            elif fmt == "b":
                f.write(np.asarray(arr, dtype=np.uint8).tobytes())
            else:
                f.write(np.asarray(arr, dtype="<i4").tobytes())


def test_fvecs_roundtrip(spark, tmp_path):
    vecs = [np.random.RandomState(i).rand(8).astype(np.float32) for i in range(5)]
    p = str(tmp_path / "t.fvecs")
    _write_xvecs(p, vecs, "f")
    got = {r.id: r.emb for r in read_fvecs(spark, p).collect()}
    assert len(got) == 5
    for i, v in enumerate(vecs):
        assert np.allclose(got[i], v)


def test_bvecs_widened_to_float(spark, tmp_path):
    vecs = [[1, 2, 3, 255], [0, 128, 7, 9]]
    p = str(tmp_path / "t.bvecs")
    _write_xvecs(p, vecs, "b")
    got = {r.id: r.emb for r in read_bvecs(spark, p).collect()}
    assert got[0] == [1.0, 2.0, 3.0, 255.0]
    assert got[1] == [0.0, 128.0, 7.0, 9.0]


def test_ivecs_groundtruth(spark, tmp_path):
    gts = [[4, 2, 9], [1, 0, 3]]
    p = str(tmp_path / "t.ivecs")
    _write_xvecs(p, gts, "i")
    got = {r.id: r.neighbors for r in read_ivecs(spark, p).collect()}
    assert got[0] == [4, 2, 9] and got[1] == [1, 0, 3]


def test_skip_and_limit(spark, tmp_path):
    vecs = [np.full(4, i, dtype=np.float32) for i in range(10)]
    p = str(tmp_path / "t.fvecs")
    _write_xvecs(p, vecs, "f")
    got = read_fvecs(spark, p, limit=3, skip=2).collect()
    assert len(got) == 3
    vals = sorted(r.emb[0] for r in got)
    assert vals == [2.0, 3.0, 4.0]
