"""Array-native text featurization kernels.

Re-expresses the reference's ml.feature text stages (SURVEY.md §2.G) as
pure Catalyst column expressions over ``array<string>`` — no VectorUDT,
no Python UDFs, fully whole-stage-codegen'd and DuckDB-oracle-checkable:

- T1 RegexTokenizer   (`01_Feature Engineering.py:184-193`)  -> regex_tokenize
- T2 StopWordsRemover (`01_Feature Engineering.py:195-201`)  -> remove_stopwords
- T4 char NGram(n=3)  (`01_Feature Engineering.py:218-225`)  -> char_ngrams / char_ngrams_of_words
- T6 word NGram(n=2)  (`01_Feature Engineering.py:342-349`)  -> word_ngrams
- T7 HashingTF        (`01_Feature Engineering.py:274-282`)  -> hashed_tf

TF-IDF (T8) is corpus-level, so it lives at the DataFrame layer:
see ``operators/features.py``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# The reference's StopWordsRemover uses Spark's English list; a fixed,
# explicit subset keeps the oracle SQL self-contained and deterministic.
ENGLISH_STOPWORDS = (
    "a an and are as at be but by for if in into is it no not of on or "
    "such that the their then there these they this to was will with"
).split()

TOKEN_SPLIT_PATTERN = r"[^\w\d]"


def regex_tokenize(col: Column | str, min_token_length: int = 1) -> Column:
    """Lowercase, split on non-word chars, drop short tokens.

    Exact semantics of RegexTokenizer(pattern='[^\\w\\d]',
    minTokenLength=1) in the reference (`01_Feature Engineering.py:184-193`).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(
        F.split(F.lower(c), TOKEN_SPLIT_PATTERN),
        lambda t: F.length(t) >= min_token_length,
    )


def remove_stopwords(tokens: Column, stopwords: list[str] | None = None) -> Column:
    """Drop stop words, preserving bag semantics and order.

    `array_except` would dedup (SURVEY §2 T2 note); `filter` keeps
    duplicates exactly like StopWordsRemover.
    """
    sw = F.array(*[F.lit(s) for s in (stopwords or ENGLISH_STOPWORDS)])
    return F.filter(tokens, lambda t: ~F.array_contains(sw, t))


def char_ngrams(word: Column | str, n: int = 3, sep: str = "") -> Column:
    """Character n-grams of one string ("fridge" -> ["fri","rid","idg","dge"]).

    Empty result if len(word) < n. ml.feature.NGram over char arrays
    emits space-joined grams ("f r i") — pass sep=" " for that exact
    rendering; the default compact form is matching-equivalent.
    """
    w = F.col(word) if isinstance(word, str) else word
    # sequence(1, 0) yields a DESCENDING [1, 0] in Spark, not [] — guard
    # the short-word case explicitly.
    grams = F.when(
        F.length(w) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(w) - (n - 1)),
            lambda i: w.substr(i, F.lit(n)),
        )
    )
    if sep:
        grams = F.transform(grams, lambda g: F.concat_ws(sep, F.split(g, "")))
    return grams


def char_ngrams_of_words(tokens: Column, n: int = 3, sep: str = "") -> Column:
    """Char n-grams of every word, flattened to one bag per row.

    Composition of the reference's melt->NGram->collapse SQLTransformer
    pair (T3/T4/T5, `01_Feature Engineering.py:203-249`) without the
    explode/groupBy shuffle: a nested `transform` + `flatten` keeps the
    whole thing row-local (no shuffle at any scale).
    """
    return F.flatten(F.transform(tokens, lambda w: char_ngrams(w, n=n, sep=sep)))


def word_ngrams(tokens: Column, n: int = 2) -> Column:
    """Word n-grams, space-joined — ml.feature.NGram(n) semantics
    (`01_Feature Engineering.py:342-349`)."""
    return F.when(
        F.size(tokens) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(tokens) - n),
            lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)),
        )
    )


def hashed_tf(terms: Column, num_features: int = 46656, binary: bool = True) -> Column:
    """Feature-hash a term bag to bucket ids: pmod(hash(term), N).

    Engine-native HashingTF (T7, `01_Feature Engineering.py:274-282`);
    uses Spark's Murmur3 `hash` (different seed/mix than MLlib's
    HashingTF, so bucket ids differ from ml.feature — semantics, not
    hash-equality, is the parity contract). Returns array of bucket ids;
    with binary=True duplicates are collapsed (presence-only TF, the
    reference's names variant `01_Feature Engineering.py:280`).
    """
    buckets = F.transform(terms, lambda t: F.pmod(F.hash(t), F.lit(num_features)))
    return F.array_distinct(buckets) if binary else buckets
