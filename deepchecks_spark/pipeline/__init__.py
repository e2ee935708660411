from deepchecks_spark.pipeline.dedup import (
    dedup_exact,
    exact_duplicate_stats,
    jaccard_adjacent,
    minhash_lsh_candidates,
    minhash_near_duplicates,
    minhash_signatures,
    simhash,
    simhash_near_duplicates,
)
from deepchecks_spark.pipeline.similarity import brute_force_topk, lsh_topk
from deepchecks_spark.pipeline.textstats import (
    document_fingerprint,
    language_id,
    text_quality,
    with_bpe_ish_token_count,
    with_token_count,
)
from deepchecks_spark.pipeline.multimodal import (
    decode_features,
    frame_sample_stub,
    resize_stub,
    with_media_metadata,
)

__all__ = [
    "dedup_exact",
    "exact_duplicate_stats",
    "jaccard_adjacent",
    "minhash_lsh_candidates",
    "minhash_near_duplicates",
    "minhash_signatures",
    "simhash",
    "simhash_near_duplicates",
    "brute_force_topk",
    "lsh_topk",
    "document_fingerprint",
    "language_id",
    "text_quality",
    "with_bpe_ish_token_count",
    "with_token_count",
    "decode_features",
    "frame_sample_stub",
    "resize_stub",
    "with_media_metadata",
]
