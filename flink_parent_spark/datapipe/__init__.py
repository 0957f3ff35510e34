from flink_parent_spark.datapipe.text import (
    token_count,
    text_quality,
    lang_id_scores,
    doc_fingerprint,
)
from flink_parent_spark.datapipe.dedup import (
    exact_dedup,
    ngram_shingles,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash,
)
from flink_parent_spark.datapipe.similarity import (
    cosine,
    dot,
    norm,
    cosine_topk,
    ivf_pq_topk,
)

__all__ = [
    "token_count",
    "text_quality",
    "lang_id_scores",
    "doc_fingerprint",
    "exact_dedup",
    "ngram_shingles",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "simhash",
    "cosine",
    "dot",
    "norm",
    "cosine_topk",
    "ivf_pq_topk",
]
