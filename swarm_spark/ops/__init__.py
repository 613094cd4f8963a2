from .dedup import (
    cosine_expr,
    doc_shingles,
    dot_expr,
    embedding_dup_pairs,
    embedding_signlsh_pairs,
    exact_dedup,
    exact_dup_stats,
    incremental_dup_flags,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    rademacher_planes,
    simhash,
    simhash_pairs,
    simhash_pairs_blocked,
)
from .asof import asof_join
from .rangejoin import range_join
from .sampling import hash_bucket, hash_sample, split_column, stratified_hash_sample
from .components import dup_components, keep_one_per_cluster
from .ivf import ann_topk_ivf, kmeans_cells
from .multimodal import attach_fake_image, media_features
from .similarity import ann_topk_bruteforce, ann_topk_cells
from .text import (
    fingerprint,
    language_id,
    normalize_text,
    pii_scrub,
    quality_score,
    repetition_signals,
    token_stats,
)

__all__ = [
    "ann_topk_bruteforce",
    "asof_join",
    "ann_topk_cells",
    "ann_topk_ivf",
    "kmeans_cells",
    "attach_fake_image",
    "cosine_expr",
    "doc_shingles",
    "dot_expr",
    "dup_components",
    "keep_one_per_cluster",
    "embedding_dup_pairs",
    "embedding_signlsh_pairs",
    "rademacher_planes",
    "exact_dedup",
    "exact_dup_stats",
    "fingerprint",
    "incremental_dup_flags",
    "language_id",
    "pii_scrub",
    "repetition_signals",
    "media_features",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "normalize_text",
    "quality_score",
    "range_join",
    "hash_bucket",
    "hash_sample",
    "split_column",
    "stratified_hash_sample",
    "simhash",
    "simhash_pairs",
    "simhash_pairs_blocked",
    "token_stats",
]
