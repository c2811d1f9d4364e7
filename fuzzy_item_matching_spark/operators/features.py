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
    n_docs: int | None = None,
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
    ``n_docs``: pass the corpus document count if known (e.g. upstream
    metadata); otherwise it is computed IN the same plan via a 1-row
    aggregate cross-joined onto the vocabulary — no eager driver-side
    ``.count()``, the whole pipeline stays one lazily-composed job.
    N counts documents with ≥1 term row (empty docs contribute nothing).

    Plan shape: two hash aggregations (tf by id+term, df by term) + one
    shuffle join on term (AQE broadcasts the vocab side when it actually
    fits — an unconditional broadcast of an unbounded vocabulary would
    OOM at 100 TB) + a window for the per-id norm. No collect.
    """
    tf = terms_df.groupBy(*id_cols, term_col).agg(F.count("*").alias("tf"))
    tf = tf.withColumn(
        "tf", F.lit(1.0) if binary else F.col("tf").cast("double")
    )

    # tf is unique per (id, term) so document frequency is a plain count.
    df_by_term = tf.groupBy(term_col).agg(F.count("*").alias("df"))
    if min_df > 1:
        df_by_term = df_by_term.filter(F.col("df") >= min_df)

    if n_docs is not None:
        n_docs_col = F.lit(float(n_docs))
        idf = df_by_term
    else:
        n_docs_df = (
            tf.select(*id_cols)
            .distinct()
            .agg(F.count(F.lit(1)).cast("double").alias("__n_docs"))
        )
        idf = df_by_term.crossJoin(F.broadcast(n_docs_df))  # 1-row broadcast
        n_docs_col = F.col("__n_docs")

    if max_df_ratio < 1.0:
        idf = idf.filter(F.col("df") <= max_df_ratio * n_docs_col)
    idf = idf.withColumn(
        "idf", F.log((n_docs_col + 1.0) / (F.col("df") + 1.0))
    ).select(term_col, "idf")

    weighted = tf.join(idf, on=term_col).withColumn(
        "weight", F.col("tf") * F.col("idf")
    )

    if normalize:
        w = Window.partitionBy(*id_cols)
        norm = F.sqrt(F.sum(F.col("weight") ** 2).over(w))
        weighted = weighted.withColumn(
            "weight",
            # norm==0 ⇔ every surviving term has idf=0 (df==N); weights
            # are all 0.0 — pass them through instead of 0/0 → null.
            F.when(norm == 0.0, F.col("weight")).otherwise(F.col("weight") / norm),
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
