from dea05_e2e_kafka_streaming_pipeline_spark.operators.asof import asof_join
from dea05_e2e_kafka_streaming_pipeline_spark.operators.cdc import (
    apply_cdc_changes,
    decode_cdc_orders,
    decode_epoch_days,
    normalize_cdc,
)
from dea05_e2e_kafka_streaming_pipeline_spark.operators.curation import (
    hash_sample,
    ngram_contamination,
    stratified_sample,
    vocab_topk,
    with_pii_redaction,
    with_quality_rules,
    with_repetition_stats,
)
from dea05_e2e_kafka_streaming_pipeline_spark.operators.dedup import (
    apply_dedup,
    apply_dedup_cc,
    connected_components,
    dedup_exact,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_pairs_md5,
    simhash_quarters_md5,
    simhash_signatures,
)
from dea05_e2e_kafka_streaming_pipeline_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    resize_images,
    synthesize_media,
)
from dea05_e2e_kafka_streaming_pipeline_spark.operators.quality import (
    DataQualityValidator,
)
from dea05_e2e_kafka_streaming_pipeline_spark.operators.sessionize import (
    session_summary,
    sessionize,
)
from dea05_e2e_kafka_streaming_pipeline_spark.operators.similarity import (
    cosine_near_dup_pairs,
    cosine_topk,
    ivf_topk,
    kmeans_centroids,
    knn_join,
    lsh_topk,
    semantic_dedup,
    semantic_dedup_pairs,
    with_ivf_cell,
    with_lsh_bucket,
)
from dea05_e2e_kafka_streaming_pipeline_spark.operators.sketches import (
    cms_build,
    cms_estimates,
    cms_heavy_hitters,
)
from dea05_e2e_kafka_streaming_pipeline_spark.operators.skew import salted_join
from dea05_e2e_kafka_streaming_pipeline_spark.operators.text import (
    with_fingerprint,
    with_lang_id,
    with_text_stats,
    with_token_estimates,
)

__all__ = [
    "with_repetition_stats",
    "with_quality_rules",
    "with_pii_redaction",
    "vocab_topk",
    "stratified_sample",
    "ngram_contamination",
    "hash_sample",
    "DataQualityValidator",
    "apply_cdc_changes",
    "apply_dedup",
    "apply_dedup_cc",
    "connected_components",
    "asof_join",
    "cms_build",
    "cms_estimates",
    "cms_heavy_hitters",
    "cosine_near_dup_pairs",
    "cosine_topk",
    "decode_cdc_orders",
    "decode_epoch_days",
    "dedup_exact",
    "extract_features",
    "frame_sample_plan",
    "ivf_topk",
    "kmeans_centroids",
    "knn_join",
    "lsh_topk",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "normalize_cdc",
    "resize_images",
    "salted_join",
    "semantic_dedup",
    "semantic_dedup_pairs",
    "session_summary",
    "sessionize",
    "simhash_pairs",
    "simhash_pairs_md5",
    "simhash_quarters_md5",
    "simhash_signatures",
    "synthesize_media",
    "with_fingerprint",
    "with_ivf_cell",
    "with_lang_id",
    "with_lsh_bucket",
    "with_text_stats",
    "with_token_estimates",
]
