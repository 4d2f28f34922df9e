"""Multimodal (image/audio/video) column operators.

The reference engine is vectors-only; a training-data pipeline at 100 TB also
carries raw media. We model media the Spark-first way: an opaque ``BINARY``
content column plus typed metadata (``MAP<STRING,STRING>``), processed with
Arrow-batched ``mapInPandas`` so the bytes never round-trip through Python
row objects. The *decode* step (real JPEG/PNG/WAV codecs) is stubbed — the
image/audio libraries are not in this container — but everything Spark-side
(schema, partitioning, UDF signatures, batch shapes, frame slicing, feature
plumbing) is real and tested.

Fixture: a deterministic media table derived from the driver's ``documents``
parquet — each doc becomes a pseudo media file ``magic_bytes(kind) + utf8
body``, kind cycling png/jpeg/wav by ``doc_id % 3``. Deriving (not storing)
the fixture keeps the DuckDB oracle able to build the identical bytes in SQL.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vstream_spark.operators.util import widen

# kind -> (hex magic, sniffable file-format prefix)
MAGICS: dict[str, str] = {
    "png": "89504E47",
    "jpeg": "FFD8FFE0",
    "wav": "52494646",
}
_MAGIC_LEN = 4  # bytes


def media_fixture(docs: DataFrame) -> DataFrame:
    """documents -> media(doc_id, kind, content BINARY, meta MAP<STR,STR>).

    content = 4 magic bytes + utf-8 body; meta carries the declared kind and
    a fake row width used by the stub decoder.
    """
    kind = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("jpeg"))
        .otherwise(F.lit("wav"))
    )
    magic = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(MAGICS["png"]))
        .when(F.col("doc_id") % 3 == 1, F.lit(MAGICS["jpeg"]))
        .otherwise(F.lit(MAGICS["wav"]))
    )
    return docs.select(
        "doc_id",
        kind.alias("kind"),
        F.concat(F.unhex(magic), F.encode("text", "UTF-8")).alias("content"),
        F.create_map(
            F.lit("kind"), kind, F.lit("width"), F.lit("16")
        ).alias("meta"),
    )


# SQL (DuckDB) twin of media_fixture for oracle queries. Body stays VARCHAR
# there (documents.text is ASCII, so character ops == byte ops).
MEDIA_FIXTURE_SQL = """
media AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'wav' END AS kind,
         unhex(CASE doc_id % 3 WHEN 0 THEN '89504E47' WHEN 1 THEN 'FFD8FFE0'
               ELSE '52494646' END) || encode(text) AS content,
         text AS body
  FROM documents
)
"""


def media_stats(media: DataFrame) -> DataFrame:
    """Per-media byte stats + format sniffed from magic bytes (never trusts
    declared metadata). Pure JVM-side expressions — no Python in the path."""
    prefix = F.substring(F.hex(F.col("content")), 1, _MAGIC_LEN * 2)
    sniff = F.lit("unknown")
    for kind, magic in sorted(MAGICS.items()):
        sniff = F.when(prefix == F.lit(magic), F.lit(kind)).otherwise(sniff)
    return media.select(
        "doc_id",
        F.length("content").cast("long").alias("n_bytes"),
        sniff.alias("format"),
        F.md5(F.substring(F.col("content"), _MAGIC_LEN + 1, 1 << 30)).alias("body_md5"),
    )


def frame_sample(
    media: DataFrame,
    frame_bytes: int = 64,
    every: int = 4,
) -> DataFrame:
    """Sample every ``every``-th fixed-size frame from the media body.

    The video-analog of the stream: body bytes are treated as concatenated
    ``frame_bytes``-sized frames; emit (doc_id, frame_idx, frame_md5) for
    frames 0, every, 2*every, ... Arrow-batched ``mapInPandas`` — the real
    slicing runs on numpy byte buffers, one batch at a time, and the final
    partial frame is kept (like a truncated last chunk in a real container).
    """

    def slice_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            md5s: list[str] = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                body = bytes(content)[_MAGIC_LEN:]
                n_frames = (len(body) + frame_bytes - 1) // frame_bytes
                for fi in range(0, n_frames, every):
                    chunk = body[fi * frame_bytes : (fi + 1) * frame_bytes]
                    ids.append(int(doc_id))
                    idxs.append(fi)
                    md5s.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_md5": md5s})

    return widen(media.select("doc_id", "content")).mapInPandas(
        slice_frames, "doc_id long, frame_idx int, frame_md5 string"
    )


def audio_pcm_frames(media: DataFrame, win: int = 64) -> DataFrame:
    """Frame-level PCM decode (the SCALED audio-triage path, r5/r6 ask).

    The Catalyst per-byte `audio_stats` path (hex + sequence explode) emits
    ONE ROW PER AUDIO BYTE — perfect for DuckDB oracle parity, wrong at
    100 TB. This operator does the O(bytes) work inside an Arrow-batched
    ``mapInPandas``: the PCM body decodes to a numpy sample vector (the
    ``decode_media`` seam's audio analog — swap in soundfile here for real
    WAV containers), frames reduce with ``np.add.reduceat``/``
    np.maximum.reduceat``, and one row per ``win``-sample FRAME leaves the
    executor (a ``win``-fold row reduction; shuffle carries 4 longs/frame).

    Every emitted field is an EXACT integer (sum of <=64 squares of uint8
    samples < 2^22 — no float leaves Python), so the downstream
    rms/rounding arithmetic runs in the SAME Catalyst expressions as the
    per-byte path and the two are bit-identical by construction (pinned in
    tests/test_multimodal.py).
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, sums, cnts, pks = [], [], [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                pcm = np.frombuffer(bytes(content), dtype=np.uint8)[
                    _MAGIC_LEN:
                ].astype(np.int64)
                n = len(pcm)
                if n == 0:
                    continue
                idx = np.arange(0, n, win)
                k = len(idx)
                ids.append(np.full(k, int(doc_id), dtype=np.int64))
                ws.append(np.arange(k, dtype=np.int64))
                sums.append(np.add.reduceat(pcm * pcm, idx))
                cnts.append(np.diff(np.append(idx, n)))
                pks.append(np.maximum.reduceat(pcm, idx))
            empty = np.empty(0, dtype=np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(ids) if ids else empty,
                    "w": np.concatenate(ws) if ws else empty,
                    "sum_sq": np.concatenate(sums) if sums else empty,
                    "n_samples": np.concatenate(cnts) if cnts else empty,
                    "peak": np.concatenate(pks) if pks else empty,
                }
            )

    return widen(media.select("doc_id", "content")).mapInPandas(
        frames, "doc_id long, w long, sum_sq long, n_samples long, peak long"
    )


def decode_media(content: bytes, meta: dict) -> np.ndarray:
    """Decode media bytes to a (H, W) float array.

    Real codecs (PIL / soundfile / av) are not available in this container;
    when they are, this is the single seam to swap in. The deterministic
    fallback interprets body bytes as a row-major uint8 grayscale image of
    width ``meta['width']`` — enough to make resize/feature plumbing real.
    """
    try:  # pragma: no cover - exercised only where PIL exists
        import PIL.Image  # noqa: F401

        raise NotImplementedError(
            "real codec decode not wired in this environment; "
            "plug PIL/soundfile decode here"
        )
    except ImportError:
        pass
    width = int(meta.get("width", 16)) if meta else 16
    body = np.frombuffer(bytes(content), dtype=np.uint8)[_MAGIC_LEN:]
    height = max(1, len(body) // width)
    return body[: height * width].reshape(height, width).astype(np.float64)


def resize_pool(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Block-mean resize (area pooling) — numpy only, deterministic.

    Vectorized as two ``np.add.reduceat`` passes (rows then cols) instead of
    out_h*out_w Python-level ``.mean()`` calls — the per-image Python loop
    dominated the sf1 decode pass. Bit-identical to the loop form: pixel
    values are uint8-derived integers, so every block sum is exact in
    float64 regardless of summation order, and the final division of two
    exact integers is the same single rounding on any path. Empty blocks
    (upscaling, block boundary collapse): ``reduceat`` returns the single
    element at the boundary index, matching the loop's ``max(lo+1, hi)``
    one-row/one-col slice; the count divisor clamps to 1 the same way."""
    h, w = img.shape
    ys = (np.arange(out_h + 1) * h / out_h).astype(np.int64)
    xs = (np.arange(out_w + 1) * w / out_w).astype(np.int64)
    rsum = np.add.reduceat(img, ys[:-1], axis=0)
    block = np.add.reduceat(rsum, xs[:-1], axis=1)
    rcnt = np.maximum(np.diff(ys), 1)
    ccnt = np.maximum(np.diff(xs), 1)
    return block / (rcnt[:, None] * ccnt[None, :]).astype(np.float64)


def media_features(media: DataFrame, dim: int = 32) -> DataFrame:
    """Decode -> resize -> flatten to a ``dim``-float feature vector.

    The multimodal embed step of a training pipeline: mapInPandas batches,
    one Arrow batch in, one (doc_id, feature ARRAY<FLOAT>) batch out. Output
    feeds directly into the vector operators (kNN, similarity join, dedup).
    """
    side = int(np.sqrt(dim))
    if side * side != dim:
        raise ValueError("dim must be a perfect square (resize to side x side)")

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for doc_id, content, meta in zip(pdf["doc_id"], pdf["content"], pdf["meta"]):
                img = decode_media(content, meta)
                pooled = resize_pool(img, side, side).ravel() / 255.0
                norm = float(np.linalg.norm(pooled))
                ids.append(int(doc_id))
                feats.append((pooled / norm if norm > 0 else pooled).astype(np.float32))
            yield pd.DataFrame({"doc_id": ids, "feature": feats})

    return widen(media.select("doc_id", "content", "meta")).mapInPandas(
        featurize, "doc_id long, feature array<float>"
    )


def media_phash(media: DataFrame, side: int = 8) -> DataFrame:
    """Perceptual difference-hash (dHash, the classic public algorithm):
    decode -> block-mean resize to ``side x (side+1)`` -> one bit per
    horizontal gradient sign -> ``side*side``-bit fingerprint packed into a
    signed int64. Near-identical media differ in a few bits; byte-identical
    media collide exactly. Arrow-batched mapInPandas; the decode stub is the
    same single seam as media_features."""
    if side * side > 64:
        raise ValueError("side*side must fit in 64 bits")

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = (np.uint64(1) << np.arange(side * side, dtype=np.uint64))
        for pdf in batches:
            ids, hs = [], []
            for doc_id, content, meta in zip(pdf["doc_id"], pdf["content"], pdf["meta"]):
                img = decode_media(content, meta)
                pooled = resize_pool(img, side, side + 1)
                bits = (pooled[:, 1:] > pooled[:, :-1]).ravel()
                h = np.uint64(0)
                if bits.any():
                    h = weights[bits].sum(dtype=np.uint64)
                ids.append(int(doc_id))
                hs.append(int(h.view(np.int64)))
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "phash": pd.Series(hs, dtype="int64")}
            )

    return widen(media.select("doc_id", "content", "meta")).mapInPandas(
        hash_batch, "doc_id long, phash long"
    )


def media_near_dedup(
    media: DataFrame, max_hamming: int = 6, bands: int = 8, side: int = 8
) -> DataFrame:
    """Media near-duplicate pairs by perceptual hash: (doc_a, doc_b, hamming)
    with hamming <= ``max_hamming``.

    Candidate generation is bit-sampling LSH for Hamming space: the 64-bit
    dHash splits into ``bands`` contiguous byte bands; pairs co-bucket on any
    identical (band, band_value). With ``max_hamming < bands`` the pigeonhole
    principle makes this EXACT — a pair differing in <= max_hamming bits
    cannot differ in every band — so the band join is pure pruning, never a
    recall loss. Verification is one JVM ``bit_count(xor)`` per candidate.
    At 100 TB: the shuffle carries (band_key, doc_id, phash) — 24 bytes per
    row per band — never media bytes; bucket sizes are bounded by hash
    entropy and AQE skew-splitting."""
    if max_hamming >= bands:
        raise ValueError(
            "max_hamming must be < bands for the pigeonhole exactness "
            f"guarantee (got hamming {max_hamming}, bands {bands})"
        )
    if 64 % bands:
        raise ValueError("bands must divide 64")
    width = 64 // bands
    mask = (1 << width) - 1
    ph = media_phash(media, side=side)
    # the band join is a SELF-join of this subtree: pin it so the decode +
    # hash pass runs once, not once per join side (the frame is tiny —
    # bands * n rows of three scalars)
    ph = ph.localCheckpoint(eager=True)
    banded = ph.select(
        "doc_id",
        "phash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("phash"), b * width).bitwiseAND(mask)
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_key"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash"))).alias(
                "hamming"
            ),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return cand
