"""Text-analysis expression library (LLM-pipeline operators, SURVEY §2.7
design consequence: these generalize the reference's machinery to documents).

Every function has two forms kept in lockstep: a SQL fragment (the portable
subset shared by Spark SQL and DuckDB — length/replace/lower/trim/md5/CASE
arithmetic only) and a Column wrapper (``F.expr`` of that same fragment). The
fragment IS the implementation, so engine and oracle cannot diverge.

All expressions are pure Catalyst — whole-stage codegen'd, no Python in the
hot path, safe at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- SQL fragments ----------------------------------------------------------


def token_count_sql(col: str) -> str:
    """Whitespace token count (single-space tokenized corpora)."""
    return (
        f"(CASE WHEN length(trim({col})) = 0 THEN 0 "
        f"ELSE length(trim({col})) - length(replace(trim({col}), ' ', '')) + 1 END)"
    )


def substr_count_sql(col: str, needle: str) -> str:
    """Occurrences of a literal substring (portable length/replace trick)."""
    esc = needle.replace("'", "''")
    return (
        f"CAST((length({col}) - length(replace({col}, '{esc}', ''))) / {len(needle)} AS BIGINT)"
    )


def word_count_sql(col: str, word: str) -> str:
    """Occurrences of a whole word: pad with spaces and count ' word '."""
    return substr_count_sql(f"(' ' || {col} || ' ')", f" {word} ")


def fingerprint_sql(col: str) -> str:
    """Document fingerprint: md5 of normalized text (S5-style canonical
    encoding; md5 is bit-identical across Spark and DuckDB)."""
    return f"md5(lower(trim({col})))"


def avg_token_len_sql(col: str) -> str:
    tc = token_count_sql(col)
    return (
        f"(CASE WHEN {tc} = 0 THEN 0.0 ELSE "
        f"CAST(length(replace(trim({col}), ' ', '')) AS DOUBLE) / {tc} END)"
    )


_EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")


def stopword_count_sql(col: str, words: tuple[str, ...] = _EN_STOPWORDS) -> str:
    return "(" + " + ".join(word_count_sql(col, w) for w in words) + ")"


def stopword_ratio_sql(col: str) -> str:
    tc = token_count_sql(col)
    return (
        f"(CASE WHEN {tc} = 0 THEN 0.0 ELSE "
        f"CAST({stopword_count_sql(col)} AS DOUBLE) / {tc} END)"
    )


def quality_score_sql(col: str) -> str:
    """Heuristic document quality in [0,1]: length band + stopword signal +
    token-length sanity (the usual pretraining-filter trio)."""
    tc = token_count_sql(col)
    atl = avg_token_len_sql(col)
    sr = stopword_ratio_sql(col)
    length_ok = f"(CASE WHEN {tc} >= 10 AND {tc} <= 100000 THEN 1.0 ELSE 0.0 END)"
    tok_ok = f"(CASE WHEN {atl} >= 2.0 AND {atl} <= 12.0 THEN 1.0 ELSE 0.0 END)"
    stop_sig = f"(CASE WHEN {sr} > 0.30 THEN 1.0 ELSE {sr} / 0.30 END)"
    return f"(0.4 * {length_ok} + 0.3 * {tok_ok} + 0.3 * {stop_sig})"


_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "und", "nicht"),
    "fr": ("le", "la", "et", "est"),
}


def lang_id_sql(col: str) -> str:
    """n-gram-free heuristic language ID: argmax of per-language whole-word
    marker counts; 'und' (undetermined) when no marker fires."""
    scores = {
        lang: "(" + " + ".join(word_count_sql(col, w) for w in words) + ")"
        for lang, words in _LANG_MARKERS.items()
    }
    langs = list(scores)
    # argmax via CASE chain: first language >= all others (dict order breaks ties)
    clauses = []
    for lang in langs:
        others = [scores[o] for o in langs if o != lang]
        cond = " AND ".join(f"{scores[lang]} >= {o}" for o in others)
        clauses.append(f"WHEN {scores[lang]} > 0 AND {cond} THEN '{lang}'")
    return "(CASE " + " ".join(clauses) + " ELSE 'und' END)"


# --- Column wrappers --------------------------------------------------------


def token_count(col: str) -> Column:
    return F.expr(token_count_sql(col))


def char_stats(col: str) -> dict[str, Column]:
    return {
        "n_chars": F.length(F.col(col)),
        "n_tokens": token_count(col),
        "avg_token_len": F.expr(avg_token_len_sql(col)),
        "stopword_ratio": F.expr(stopword_ratio_sql(col)),
    }


def quality_score(col: str) -> Column:
    return F.expr(quality_score_sql(col))


def doc_fingerprint(col: str) -> Column:
    return F.expr(fingerprint_sql(col))


def lang_id_expr(col: str) -> Column:
    return F.expr(lang_id_sql(col))


# --- Rule-based quality filter (Gopher/C4-style keep/drop) -------------------
#
# Every rule is a boolean SQL fragment that evaluates identically in Spark
# and DuckDB (substr-count arithmetic only — no engine-divergent regexp), so
# the filter decision is oracle-checkable bit-for-bit.

_SYMBOLS = ("#", "{", "}", "<", ">")


def symbol_count_sql(col: str) -> str:
    return "(" + " + ".join(substr_count_sql(col, s) for s in _SYMBOLS) + ")"


def quality_rules_sql(col: str, lang_col: str = "lang") -> dict[str, str]:
    """Named keep-rules; a document is kept iff every rule holds."""
    tc = token_count_sql(col)
    return {
        "len": f"(length({col}) BETWEEN 20 AND 20000)",
        "tokens": f"({tc} BETWEEN 5 AND 5000)",
        "avg_token_len": f"({avg_token_len_sql(col)} BETWEEN 2.0 AND 12.0)",
        "stopwords": f"({lang_col} != 'en' OR {stopword_ratio_sql(col)} >= 0.02)",
        "symbols": f"(CAST({symbol_count_sql(col)} AS DOUBLE) / {tc} <= 0.1)",
    }


def quality_keep_sql(col: str, lang_col: str = "lang") -> str:
    return "(" + " AND ".join(quality_rules_sql(col, lang_col).values()) + ")"


def quality_fail_reasons_sql(col: str, lang_col: str = "lang") -> str:
    """Comma-joined names of failed rules ('' when kept) — concat_ws skips
    NULLs identically in Spark and DuckDB."""
    cases = ", ".join(
        f"CASE WHEN NOT {sql} THEN '{name}' END"
        for name, sql in quality_rules_sql(col, lang_col).items()
    )
    return f"concat_ws(',', {cases})"


def quality_filter(docs, text_col: str = "text", lang_col: str = "lang"):
    """DataFrame form: (doc_id, keep, fail_reasons) for every document."""
    return docs.select(
        "doc_id",
        F.expr(quality_keep_sql(text_col, lang_col)).alias("keep"),
        F.expr(quality_fail_reasons_sql(text_col, lang_col)).alias("fail_reasons"),
    )


def chunk_tokens(
    docs,
    chunk_size: int = 32,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Split documents into token-window chunks (the sequence-construction
    step of a training pipeline: fixed-size windows, optional overlap via
    ``stride`` < ``chunk_size``). Chunk i covers tokens
    [i*stride, i*stride + chunk_size); the last chunk may be shorter.

    Pure Catalyst (split -> sequence -> posexplode of slices): pushes down,
    codegens, zero shuffles — scales linearly with executors. Returns
    (doc_id, chunk_idx, chunk_text, n_tokens).
    """
    if stride is None:
        stride = chunk_size
    if chunk_size <= 0 or stride <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toks = F.split(F.trim(F.col(text_col)), " ")
    n_chunks = F.greatest(
        F.ceil(F.size("_t") / F.lit(float(stride))).cast("int"), F.lit(1)
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("_t"))
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), n_chunks - 1),
                    lambda i: F.slice(F.col("_t"), i * stride + 1, chunk_size),
                )
            ).alias("chunk_idx", "_chunk"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.concat_ws(" ", F.col("_chunk")).alias("chunk_text"),
            F.size("_chunk").alias("n_tokens"),
        )
    )


# --- PII redaction (training-corpus scrub) -----------------------------------
#
# Patterns are restricted to the Java-regex ∩ RE2 common subset (character
# classes, bounded repetition, \b word boundaries — no lookaround, no
# backrefs) so the Spark and DuckDB redactions agree byte-for-byte.

_PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<ID>"),
    (r"\b\d{1,3}(\.\d{1,3}){3}\b", "<IP>"),
)


def redact_pii(col: Column | str) -> Column:
    """Replace emails, SSN-shaped ids, and IPv4 addresses with typed
    placeholders. A chain of JVM-side ``regexp_replace`` — codegen, no
    Python, applied in one projection over the corpus scan."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, repl in _PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def redact_pii_sql(expr: str) -> str:
    """DuckDB twin of ``redact_pii`` ('g' flag: DuckDB replaces only the
    first match by default, Spark replaces all)."""
    for pat, repl in _PII_PATTERNS:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


def chunk_tokens_sql(
    chunk_size: int = 32,
    stride: int | None = None,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of ``chunk_tokens`` (list slicing clamps out-of-range on
    both engines, so the ragged last chunk agrees)."""
    if stride is None:
        stride = chunk_size
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id, string_split(trim({text_col}), ' ') AS t FROM {table}),
idx AS (
  SELECT doc_id, t,
         unnest(range(0, greatest(CAST(ceil(len(t) / {float(stride)}) AS BIGINT), 1)))
           AS chunk_idx
  FROM toks)
SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
       array_to_string(t[chunk_idx * {stride} + 1 : chunk_idx * {stride} + {chunk_size}], ' ')
         AS chunk_text,
       len(t[chunk_idx * {stride} + 1 : chunk_idx * {stride} + {chunk_size}]) AS n_tokens
FROM idx
"""


def pack_sequences(
    docs,
    seq_len: int = 1024,
    chunk_size: int = 32,
    num_shards: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """GPT-style sequence packing: non-overlapping token chunks are
    concatenated in deterministic order and cut into ``seq_len``-token
    training sequences via a prefix-sum bin assignment (a chunk belongs to
    the sequence its first token falls in — the standard approximate
    packing; bins may run over by < chunk_size).

    Scale shape: packing is embarrassingly parallel ACROSS shards (a
    deterministic md5 bucket of doc_id — same arithmetic as the sampling
    family) and a window prefix-sum WITHIN each shard, so no global sort or
    single-partition bottleneck exists at any corpus size. Returns one row
    per (shard, seq_id) with chunk/token counts.
    """
    from pyspark.sql import Window

    from vstream_spark.operators.sample import _hash_bucket

    chunks = chunk_tokens(docs, chunk_size, chunk_size, text_col, id_col)
    sharded = chunks.withColumn(
        "shard", (_hash_bucket(F.col("doc_id"), 7) % num_shards).cast("int")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id", "chunk_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    seq = sharded.withColumn(
        "seq_id", F.floor((cum - F.col("n_tokens")) / seq_len).cast("long")
    )
    return seq.groupBy("shard", "seq_id").agg(
        F.count("*").alias("n_chunks"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
        F.count_distinct("doc_id").alias("n_docs"),
    )


def pack_sequences_sql(
    seq_len: int = 1024,
    chunk_size: int = 32,
    num_shards: int = 16,
    table: str = "documents",
) -> str:
    """DuckDB twin of ``pack_sequences``."""
    from vstream_spark.operators.sample import hash_bucket_sql

    chunks = chunk_tokens_sql(chunk_size, chunk_size, table)
    bucket = hash_bucket_sql("doc_id", 7)
    return f"""
WITH chunks AS ({chunks}),
sharded AS (
  SELECT *, CAST({bucket} % {num_shards} AS INT) AS shard FROM chunks),
seq AS (
  SELECT shard, doc_id, n_tokens,
         CAST(floor((sum(n_tokens) OVER (PARTITION BY shard
                ORDER BY doc_id, chunk_idx ROWS UNBOUNDED PRECEDING)
              - n_tokens) / {seq_len}) AS BIGINT) AS seq_id
  FROM sharded)
SELECT shard, seq_id, count(*) AS n_chunks,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       count(DISTINCT doc_id) AS n_docs
FROM seq GROUP BY shard, seq_id
"""
