"""Column-level function library (all JVM-side Catalyst expressions)."""

from fuzzy_item_matching_spark.functions.text import (  # noqa: F401
    char_ngrams,
    char_ngrams_of_words,
    hashed_tf,
    regex_tokenize,
    remove_stopwords,
    word_ngrams,
)
from fuzzy_item_matching_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
    l2_normalize,
    squared_dist,
)
