"""DataFrame-level operators (corpus aggregations, joins, dedup)."""

from fuzzy_item_matching_spark.operators.features import (  # noqa: F401
    sparse_tfidf,
    tfidf_features,
)
from fuzzy_item_matching_spark.operators.similarity import (  # noqa: F401
    exact_sqdist_join,
    featurize_text,
    fuzzy_match_pairs,
    sparse_cosine_join,
)
