"""Text-analysis expression semantics vs Python reference."""

import pytest
from pyspark.sql import functions as F

from vstream_spark.functions.text import (
    doc_fingerprint,
    lang_id_expr,
    quality_score,
    token_count,
)

ROWS = [
    (0, "the cat sat on the mat"),
    (1, "hello"),
    (2, "  padded   text  "),  # note: double spaces count as empty tokens
    (3, "el perro de la casa que ladra"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id bigint, text string")


def test_token_count_single_spaced(docs):
    got = {r.doc_id: r.n for r in docs.select("doc_id", token_count("text").alias("n")).collect()}
    assert got[0] == 6
    assert got[1] == 1


def test_fingerprint_is_md5_of_normalized(docs):
    import hashlib

    got = {
        r.doc_id: r.fp
        for r in docs.select("doc_id", doc_fingerprint("text").alias("fp")).collect()
    }
    assert got[1] == hashlib.md5(b"hello").hexdigest()


def test_lang_id_picks_marker_language(docs):
    got = {
        r.doc_id: r.lang
        for r in docs.select("doc_id", lang_id_expr("text").alias("lang")).collect()
    }
    assert got[0] == "en"
    assert got[3] == "es"
    assert got[1] == "und"


def test_quality_score_bounds(docs):
    vals = [r.q for r in docs.select(quality_score("text").alias("q")).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_quality_filter_rules(spark):
    from vstream_spark.functions.text import quality_filter

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox and the lazy dog ran over a hill", "en"),
            (1, "short", "en"),                              # len + tokens fail
            (2, "x " * 3000, "en"),                          # too many chars
            (3, "znbq wrtpl kfjd mxvz qplt hszw bnrk", "en"),  # no stopwords
            (4, "## {##} <<{{#}}>> ## {} <> ## {} the and", "en"),  # symbols
            (5, "ein kurzer deutscher satz ohne englische woerter", "de"),
        ],
        "doc_id bigint, text string, lang string",
    )
    got = {r.doc_id: r for r in quality_filter(docs).collect()}
    assert got[0].keep and got[0].fail_reasons == ""
    assert not got[1].keep
    assert "len" in got[1].fail_reasons and "tokens" in got[1].fail_reasons
    assert not got[2].keep and "len" in got[2].fail_reasons
    assert not got[3].keep and got[3].fail_reasons == "stopwords"
    assert not got[4].keep and "symbols" in got[4].fail_reasons
    # the stopword rule is en-only: German text passes it
    assert got[5].keep


def test_chunk_tokens_windows_and_ragged_tail(spark):
    from vstream_spark.functions.text import chunk_tokens

    docs = spark.createDataFrame(
        [(1, " ".join(str(i) for i in range(10))), (2, "a b"), (3, "solo")],
        "doc_id bigint, text string",
    )
    out = chunk_tokens(docs, chunk_size=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.chunk_idx, r.chunk_text, r.n_tokens))
    # doc 1: 10 tokens, stride 3 -> ceil(10/3)=4 chunks; overlap of 1 token
    c1 = sorted(by_doc[1])
    assert [c[0] for c in c1] == [0, 1, 2, 3]
    assert c1[0][1] == "0 1 2 3" and c1[1][1] == "3 4 5 6"
    assert c1[3] == (3, "9", 1)  # ragged tail
    # short docs produce exactly one chunk covering everything
    assert by_doc[2] == [(0, "a b", 2)] and by_doc[3] == [(0, "solo", 1)]


def test_decontaminate_flags_only_overlapping_docs(spark):
    from vstream_spark.operators.dedup import decontaminate

    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "entirely different words here now"),
            (3, "quick brown fox elsewhere too"),
        ],
        "doc_id bigint, text string",
    )
    eval_docs = spark.createDataFrame(
        [(100, "a quick brown fox appeared")], "doc_id bigint, text string"
    )
    got = {r.doc_id: r.is_contaminated for r in decontaminate(train, eval_docs, n=3).collect()}
    # docs 1 and 3 share the 3-gram 'quick brown fox'; doc 2 shares nothing
    assert got == {1: True, 2: False, 3: True}


def test_redact_pii_patterns(spark):
    from vstream_spark.functions.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@sub.example.org now"),
            (2, "host 192.168.1.254 and id 123-45-6789"),
            (3, "clean text 12.3 v1.2.3 a@b no match"),
        ],
        "doc_id bigint, text string",
    )
    got = {r.doc_id: r.c for r in df.select("doc_id", redact_pii("text").alias("c")).collect()}
    assert got[1] == "mail <EMAIL> now"
    assert got[2] == "host <IP> and id <ID>"
    # near-misses survive: short decimals, versions, no-TLD at-signs
    assert got[3] == "clean text 12.3 v1.2.3 a@b no match"


def test_token_histogram_buckets(spark):
    from vstream_spark.queries import REGISTRY

    fn, _ = REGISTRY["text_token_histogram"]
    rows = fn(spark, "/root/testdata/sf0.001").collect()
    n_docs = sum(r.n_docs for r in rows)
    assert n_docs == 500 and all(r.bucket >= 0 for r in rows)
    # buckets are 16 tokens wide; corpus docs are 10..99 tokens
    assert {r.bucket for r in rows} <= set(range(0, 7))


def test_pack_sequences_conservation(spark):
    from vstream_spark.functions.text import chunk_tokens, pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(5 + i % 40))) for i in range(60)],
        "doc_id bigint, text string",
    )
    packed = pack_sequences(docs, seq_len=64, chunk_size=8, num_shards=4).collect()
    chunks = chunk_tokens(docs, 8, 8).collect()
    # token + chunk mass is conserved through packing
    assert sum(r.n_tokens for r in packed) == sum(r.n_tokens for r in chunks)
    assert sum(r.n_chunks for r in packed) == len(chunks)
    # approx packing: a bin targets seq_len tokens but chunk granularity
    # lets it run over OR under by < chunk_size (an overrun eats into the
    # next bin's range); only the last sequence of a shard may be shorter
    by_shard = {}
    for r in packed:
        by_shard.setdefault(r.shard, []).append(r)
    for rs in by_shard.values():
        rs.sort(key=lambda r: r.seq_id)
        for r in rs[:-1]:
            assert 64 - 8 < r.n_tokens < 64 + 8


def test_redact_pii_matches_python_re(spark):
    """The Java-regex patterns must behave identically to the same patterns
    under Python re (the RE2/Java common-subset claim) on adversarial
    near-miss inputs."""
    import re as _re

    from vstream_spark.functions.text import _PII_PATTERNS, redact_pii

    cases = [
        "a@b.co",
        "a@b.c",  # 1-char TLD: not an email
        "x.y+z@sub.domain.example.travel trailing",
        "1.2.3.4",
        "1.2.3.4.5",  # 5 octets: first four redact as an IP
        "255.255.255.255 999.999.999.999",
        "v1.2.3 build 10.4",  # version strings: no IP
        "123-45-6789",
        "1234-45-6789 123-456-6789 123-45-67890",  # wrong group widths
        "email@192.168.0.1",  # ip-shaped domain is still an email match
        "double..dots@weird..example.com",
        "  padded   10.0.0.7  ",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id bigint, text string"
    )
    got = {
        r.doc_id: r.c
        for r in df.select("doc_id", redact_pii("text").alias("c")).collect()
    }
    for i, t in enumerate(cases):
        want = t
        for pat, repl in _PII_PATTERNS:
            want = _re.sub(pat, repl, want)
        assert got[i] == want, (t, got[i], want)


def test_quality_linreg_learns(spark):
    """The 3-step GD fit must actually reduce error vs the zero model
    (predicting 0 for every doc), and predictions must be finite."""
    import numpy as np

    from vstream_spark.queries import REGISTRY

    fn, _ = REGISTRY["text_quality_linreg"]
    pdf = fn(spark, "/root/testdata/sf0.001").toPandas()
    assert len(pdf) > 0 and pdf["pred_quality"].notna().all()
    mse_zero = float((pdf["quality"] ** 2).mean())
    mse_fit = float(((pdf["quality"] - pdf["pred_quality"]) ** 2).mean())
    assert mse_fit < mse_zero * 0.5, (mse_fit, mse_zero)
    assert np.isfinite(pdf["pred_quality"]).all()
