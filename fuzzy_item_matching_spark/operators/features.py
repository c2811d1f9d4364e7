"""Corpus-level featurization: TF-IDF over term bags, sparse layout.

The reference materializes TF-IDF as dense hashed VectorUDT columns
(HashingTF -> IDF, `01_Feature Engineering.py:274-290`). At 100 TB the
right physical layout is SPARSE and RELATIONAL: one row per
(id, term, weight). That keeps every step a plain shuffle-partitioned
aggregation/join that Catalyst can plan, makes weights
DuckDB-oracle-checkable, and feeds the inverted-index similarity join
(`operators/similarity.py`) without ever building a dense vector.

IDF formula is MLlib's: log((N+1)/(df+1))  (ml.feature.IDF,
`01_Feature Engineering.py:284-290`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sparse_tfidf(
    terms_df: DataFrame,
    id_cols: list[str],
    term_col: str = "term",
    binary: bool = False,
    min_df: int = 1,
    max_df_ratio: float = 1.0,
    normalize: bool = True,
) -> DataFrame:
    """(id, term) rows -> (id, term, weight) L2-normalized TF-IDF rows.

    ``terms_df`` has one row per term OCCURRENCE (bag semantics).
    ``binary=True`` is presence-only TF — the reference's "IDF-only"
    names variant (`01_Feature Engineering.py:280`).
    ``max_df_ratio`` drops terms appearing in more than that fraction of
    documents: at scale the inverted-index join is quadratic in per-term
    document frequency, so ultra-common terms must be cut (this is the
    blocking analogue of the reference's LSH threshold tuning,
    `02_Build Training Pairs.py:119-123`).

    Plan shape: two hash aggregations (tf by id+term, df by term) + one
    join on term + a window (or join) for the per-id norm. All shuffles
    are on bounded keys; no collect.
    """
    tf = terms_df.groupBy(*id_cols, term_col).agg(F.count("*").alias("tf"))
    if binary:
        tf = tf.withColumn("tf", F.lit(1.0)).withColumn("tf", F.col("tf").cast("double"))
    else:
        tf = tf.withColumn("tf", F.col("tf").cast("double"))

    n_docs = terms_df.select(*id_cols).distinct().count()
    df_by_term = tf.groupBy(term_col).agg(F.countDistinct(*id_cols).alias("df"))
    if min_df > 1:
        df_by_term = df_by_term.filter(F.col("df") >= min_df)
    if max_df_ratio < 1.0:
        df_by_term = df_by_term.filter(F.col("df") <= int(max_df_ratio * n_docs))

    idf = df_by_term.withColumn(
        "idf", F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df") + 1.0))
    ).select(term_col, "idf")

    # df_by_term is |vocab| rows — broadcast it so the weight join is
    # shuffle-free on the big side.
    weighted = tf.join(F.broadcast(idf), on=term_col).withColumn(
        "weight", F.col("tf") * F.col("idf")
    )

    if normalize:
        w = Window.partitionBy(*id_cols)
        weighted = weighted.withColumn(
            "weight", F.col("weight") / F.sqrt(F.sum(F.col("weight") ** 2).over(w))
        )
    return weighted.select(*id_cols, term_col, "weight")


def tfidf_features(
    df: DataFrame,
    id_cols: list[str],
    terms_col: str,
    **kwargs,
) -> DataFrame:
    """Convenience: explode a term-bag array column then sparse_tfidf."""
    terms = df.select(*id_cols, F.explode(terms_col).alias("term"))
    return sparse_tfidf(terms, id_cols, "term", **kwargs)
