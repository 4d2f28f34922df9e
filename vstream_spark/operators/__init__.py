from vstream_spark.operators.knn import knn_exact, apply_deletes, ttl_filter, topk
from vstream_spark.operators.partitioned import knn_partitioned
from vstream_spark.operators.dedup import (
    dedup_exact,
    dedup_fingerprint,
    ngram_jaccard_pairs,
    minhash_lsh_candidates,
    simhash_signatures,
)
from vstream_spark.operators.similarity import similarity_join_exact, ann_topk_ivf

__all__ = [
    "knn_exact",
    "apply_deletes",
    "ttl_filter",
    "topk",
    "knn_partitioned",
    "dedup_exact",
    "dedup_fingerprint",
    "ngram_jaccard_pairs",
    "minhash_lsh_candidates",
    "simhash_signatures",
    "similarity_join_exact",
    "ann_topk_ivf",
]
