"""DataFrame-level operators (corpus aggregations, joins, dedup).

Caching policy: operators ``persist()`` (MEMORY_AND_DISK) frames that
feed both sides of a self-join or repeated downstream stages — the
blocks are meant to live for the duration of one query's execution.
Lazy operators can't unpersist what their caller hasn't consumed yet,
so long-lived multi-query loops (bench.py, scripts/driver_sim.py) call
``spark.catalog.clearCache()`` between queries; interactive callers
holding a session open should do the same after materializing results.
"""

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
