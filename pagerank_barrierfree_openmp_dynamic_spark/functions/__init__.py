from .text import (  # noqa: F401
    token_count,
    filter_cascade,
    quality_score,
    lang_id,
    fingerprint,
    simhash,
    simhash_blocks,
    simhash_near_dup_pairs,
    repetition_stats,
    lm_score,
    readability,
)
from .dedup import (  # noqa: F401
    exact_duplicates,
    dedup_exact,
    shingles,
    minhash_signatures,
    lsh_candidate_pairs,
    jaccard_verify,
    minhash_near_dup_pairs,
    near_dup_against_corpus,
    near_dup_clusters,
    ngram_jaccard_pairs,
    containment_verify,
    ngram_containment_pairs,
)
from .similarity import (  # noqa: F401
    brute_force_topk,
    lsh_topk,
    add_lsh_bucket,
    embedding_near_dup_brute,
    embedding_near_dup_pairs,
    ivf_train_centroids,
    ivf_topk,
)
from .pii import (  # noqa: F401
    PII_PATTERNS,
    pii_scan,
    redact_pii,
    redact_column,
)
from .multimodal import (  # noqa: F401
    audio_stats,
    decode_bmp,
    decode_image,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
    extract_features,
    image_features,
    image_stats,
    media_metadata_stats,
    resize_images,
    sample_frames,
    synth_bmp_media,
    synth_png_media,
    synth_wav_media,
)
from .packing import (  # noqa: F401
    pack_concat,
    pack_greedy,
    packing_fill,
)
from .mixture import (  # noqa: F401
    curriculum_buckets,
    source_mixture_weights,
)
