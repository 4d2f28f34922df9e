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
