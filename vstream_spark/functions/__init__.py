from vstream_spark.functions.distance import l2sq, inner_product, cosine_distance, distance_expr
from vstream_spark.functions.text import (
    token_count,
    char_stats,
    quality_score,
    doc_fingerprint,
    lang_id_expr,
)

__all__ = [
    "l2sq",
    "inner_product",
    "cosine_distance",
    "distance_expr",
    "token_count",
    "char_stats",
    "quality_score",
    "doc_fingerprint",
    "lang_id_expr",
]
