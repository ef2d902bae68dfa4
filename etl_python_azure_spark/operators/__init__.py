"""Relational + extension operators (SURVEY §2.3–2.8 and north-star ops)."""

from .aggregates import (  # noqa: F401
    finalize_avg,
    merge_partial_aggregates,
    partial_aggregate,
)
from .arrays import array_head, positional_unnest  # noqa: F401
from .asof import asof_join  # noqa: F401
from .dedup import (  # noqa: F401
    embedding_cosine_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from .joins import anti_join, cdc_split, left_join, merge_upsert, semi_join  # noqa: F401
from .layout import normalize_to_bits, write_zordered, zorder_key  # noqa: F401
from .range_join import band_join, bucketed_range_join  # noqa: F401
from .sessionize import sessionize, tumbling_window  # noqa: F401
from .similarity import (  # noqa: F401
    cosine_topk,
    ivf_assign,
    ivf_topk,
    ivf_topk_from_index,
    kmeans_centroids,
    lsh_buckets,
    lsh_topk,
    standardize_embeddings,
)
from .skew import salted_aggregate, salted_join  # noqa: F401
from .text import (  # noqa: F401
    doc_fingerprints,
    language_id,
    text_quality,
    token_counts,
)
