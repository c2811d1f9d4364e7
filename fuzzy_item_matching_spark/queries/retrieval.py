"""Retrieval and probabilistic record-linkage queries — the ranked
half of the fuzzy-matching surface.

The reference scores candidate item pairs with an MLlib model over
TF-IDF features (`02_Define Matching Pipelines.py`); this module adds
the two classical alternatives a large-scale matching pipeline runs
FIRST, both fully SQL-expressible and exact-oracle-checked:

- BM25 ranked retrieval (`sim_bm25_topk`): the standard lexical
  retriever used to generate match candidates before any model scores
  them.
- Fellegi–Sunter probabilistic linkage (`serve_fs_linkage`): blocked
  agreement vectors weighted by log-likelihood ratios, with
  u-probabilities estimated from the data itself — the canonical
  record-linkage scorer (Fellegi & Sunter 1969), here as one
  declarative plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fuzzy_item_matching_spark.queries import query
from fuzzy_item_matching_spark.queries.text import _D_TOKENS
from fuzzy_item_matching_spark.functions.text import regex_tokenize
from fuzzy_item_matching_spark.tables import load_table

# The standing query for BM25 — three mid-frequency corpus terms.
_BM25_TERMS = ("spark", "join", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_K = 20


@query(
    "sim_bm25_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_D_TOKENS.format(c="text")}) AS term
      FROM documents
    ),
    dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
    corp AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                    CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
             FROM dl),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks
      WHERE term IN ('{_BM25_TERMS[0]}', '{_BM25_TERMS[1]}', '{_BM25_TERMS[2]}')
      GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    terms AS (
      SELECT tf.doc_id,
             ln((corp.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1.0)
               * ((tf.tf * {_BM25_K1 + 1.0}) /
                  (tf.tf + {_BM25_K1} * ({1.0 - _BM25_B} +
                   {_BM25_B} * dl.dl / corp.avgdl))) AS t
      FROM tf
      JOIN dfreq USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN corp
    )
    SELECT doc_id, n_terms, score FROM (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_terms,
             CAST(SUM(CAST(t AS DECIMAL(38,18))) AS DOUBLE) AS score,
             row_number() OVER (
               ORDER BY CAST(SUM(CAST(t AS DECIMAL(38,18))) AS DOUBLE) DESC,
                        doc_id) AS rnk
      FROM terms GROUP BY doc_id
    ) WHERE rnk <= {_BM25_K}
    """,
)
def sim_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval: top-{k} documents for a standing 3-term
    query (Robertson/Sparck-Jones idf, k1={k1}, b={b}).

    Plan: the token explode feeds doc lengths (one hash agg) and the
    query-term tf rows (the IN filter prunes BEFORE the agg, so the tf
    shuffle carries only matching terms — at 100 TB that's the posting
    list for 3 terms, not the corpus). df and the corpus stats are
    kilobyte-sized aggregates → broadcast joins; final ranking is a
    top-k over |matching docs| rows (TakeOrderedAndProject after the
    window filter). No O(corpus) shuffle except the doc-length agg,
    which any retrieval system needs once and would precompute.

    Determinism: per-term scores are a fixed IEEE expression tree on
    exact integers (tf, df, dl) plus one shared avgdl division —
    bit-identical across engines; the per-doc sum over the ≤3 terms
    accumulates as DECIMAL(38,18) per repo convention. Ranking
    tie-breaks on doc_id, LIMIT only after that total order.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(regex_tokenize("text")).alias("term"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corp = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    t = idf * (
        (F.col("tf") * F.lit(_BM25_K1 + 1.0))
        / (
            F.col("tf")
            + F.lit(_BM25_K1)
            * (
                F.lit(1.0 - _BM25_B)
                + F.lit(_BM25_B) * F.col("dl") / F.col("avgdl")
            )
        )
    )
    terms = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corp))
        .select("doc_id", t.alias("t"))
    )
    scored = terms.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(F.col("t").cast("decimal(38,18)")).cast("double").alias("score"),
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(_BM25_K)
        .select("doc_id", "n_terms", "score")
    )


sim_bm25_topk.__doc__ = sim_bm25_topk.__doc__.format(
    k=_BM25_K, k1=_BM25_K1, b=_BM25_B
)

# Fellegi–Sunter m-probabilities (P[field agrees | true match]) — fixed
# model constants; the u-probabilities (P[agrees | non-match]) are
# estimated from the data as the random-pair agreement frequency
#   u_f = Σ_v n_v(n_v-1) / (N(N-1)).
_FS_M_TYPE = 0.95
_FS_M_TOK1 = 0.90
_FS_M_TOK2 = 0.90


@query(
    "serve_fs_linkage",
    oracle=f"""
    WITH p AS (
      SELECT p_partkey, p_brand, p_size,
             coalesce(p_type, '') AS f_type,
             split_part(coalesce(p_name, ''), ' ', 1) AS f_tok1,
             split_part(coalesce(p_name, ''), ' ', 2) AS f_tok2
      FROM part
    ),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM p),
    u_type AS (SELECT SUM(c * (c - 1.0)) / (nn.n * (nn.n - 1.0)) AS u FROM
               (SELECT f_type, COUNT(*) AS c FROM p GROUP BY f_type), nn
               GROUP BY nn.n),
    u_tok1 AS (SELECT SUM(c * (c - 1.0)) / (nn.n * (nn.n - 1.0)) AS u FROM
               (SELECT f_tok1, COUNT(*) AS c FROM p GROUP BY f_tok1), nn
               GROUP BY nn.n),
    u_tok2 AS (SELECT SUM(c * (c - 1.0)) / (nn.n * (nn.n - 1.0)) AS u FROM
               (SELECT f_tok2, COUNT(*) AS c FROM p GROUP BY f_tok2), nn
               GROUP BY nn.n),
    pairs AS (
      SELECT a.p_partkey AS id1, b.p_partkey AS id2,
             CASE WHEN a.f_type = b.f_type THEN 1 ELSE 0 END AS agr_type,
             CASE WHEN a.f_tok1 = b.f_tok1 THEN 1 ELSE 0 END AS agr_tok1,
             CASE WHEN a.f_tok2 = b.f_tok2 THEN 1 ELSE 0 END AS agr_tok2
      FROM p a JOIN p b
        ON a.p_brand = b.p_brand AND a.p_size = b.p_size
       AND a.p_partkey < b.p_partkey
    )
    SELECT id1, id2, agr_type, agr_tok1, agr_tok2,
           CAST(
             CAST(CASE WHEN agr_type = 1 THEN ln({_FS_M_TYPE} / u_type.u)
                  ELSE ln({1.0 - _FS_M_TYPE} / (1.0 - u_type.u)) END
                  AS DECIMAL(38,18))
           + CAST(CASE WHEN agr_tok1 = 1 THEN ln({_FS_M_TOK1} / u_tok1.u)
                  ELSE ln({1.0 - _FS_M_TOK1} / (1.0 - u_tok1.u)) END
                  AS DECIMAL(38,18))
           + CAST(CASE WHEN agr_tok2 = 1 THEN ln({_FS_M_TOK2} / u_tok2.u)
                  ELSE ln({1.0 - _FS_M_TOK2} / (1.0 - u_tok2.u)) END
                  AS DECIMAL(38,18))
           AS DOUBLE) AS weight
    FROM pairs, u_type, u_tok1, u_tok2
    """,
)
def serve_fs_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter probabilistic record linkage over blocked part
    pairs: agreement vectors on (type, name-token-1, name-token-2)
    weighted by log-likelihood ratios ln(m/u) / ln((1-m)/(1-u)), with
    u-probabilities estimated from the data as random-pair agreement
    rates. The classical scorer the reference's ML model replaces
    (`02_Define Matching Pipelines.py` trains where FS would be fit);
    at 100 TB you run THIS first and reserve the model for the
    ambiguous middle band.

    Plan: u-estimation is three value-frequency aggs over single
    columns (map-side combinable, tiny outputs → broadcast as scalar
    frames). Candidate generation is a self-equi-join on the
    (p_brand, p_size) blocking key — never all-pairs; block sizes
    bound the quadratic term exactly as the reference's
    approxSimilarityJoin bounds it with LSH buckets, and a skewed
    block would be handled by the salted-join operator
    (operators/skew.py). Weight summation is a 3-term DECIMAL(38,18)
    accumulation (repo determinism convention) cast to double at the
    end.
    """
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.coalesce("p_type", F.lit("")).alias("f_type"),
        F.split(F.coalesce("p_name", F.lit("")), " ").getItem(0).alias("f_tok1"),
        F.coalesce(
            F.split(F.coalesce("p_name", F.lit("")), " ").getItem(1), F.lit("")
        ).alias("f_tok2"),
    )
    p.persist()
    n = p.agg(F.count(F.lit(1)).cast("double").alias("n"))

    def u_of(field: str, alias: str) -> DataFrame:
        counts = p.groupBy(field).agg(F.count(F.lit(1)).alias("c"))
        return counts.crossJoin(F.broadcast(n)).agg(
            (
                F.sum(F.col("c") * (F.col("c") - 1.0))
                / F.first(F.col("n") * (F.col("n") - 1.0))
            ).alias(alias)
        )

    a, b = p.alias("a"), p.alias("b")
    pairs = a.join(
        b,
        (F.col("a.p_brand") == F.col("b.p_brand"))
        & (F.col("a.p_size") == F.col("b.p_size"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey")),
    ).select(
        F.col("a.p_partkey").alias("id1"),
        F.col("b.p_partkey").alias("id2"),
        (F.col("a.f_type") == F.col("b.f_type")).cast("int").alias("agr_type"),
        (F.col("a.f_tok1") == F.col("b.f_tok1")).cast("int").alias("agr_tok1"),
        (F.col("a.f_tok2") == F.col("b.f_tok2")).cast("int").alias("agr_tok2"),
    )

    def w(agr: str, m: float, ucol: str):
        return F.when(
            F.col(agr) == 1, F.log(F.lit(m) / F.col(ucol))
        ).otherwise(F.log(F.lit(1.0 - m) / (1.0 - F.col(ucol)))).cast(
            "decimal(38,18)"
        )

    return (
        pairs.crossJoin(F.broadcast(u_of("f_type", "u_type")))
        .crossJoin(F.broadcast(u_of("f_tok1", "u_tok1")))
        .crossJoin(F.broadcast(u_of("f_tok2", "u_tok2")))
        .select(
            "id1",
            "id2",
            "agr_type",
            "agr_tok1",
            "agr_tok2",
            (
                w("agr_type", _FS_M_TYPE, "u_type")
                + w("agr_tok1", _FS_M_TOK1, "u_tok1")
                + w("agr_tok2", _FS_M_TOK2, "u_tok2")
            )
            .cast("double")
            .alias("weight"),
        )
    )
