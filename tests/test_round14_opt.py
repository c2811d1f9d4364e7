"""Round-14 optimization equality pins.

Each optimization rewrote an operator's physical shape while claiming
bit-identical output; these tests pin that claim against an
INDEPENDENT implementation (not the DuckDB oracle, which for the
winnowing kernel now shares the engine's code path).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_CHECK


def test_winnowing_kernel_equals_native(spark):
    """The DuckDB-kernel winnowing (default path) must emit exactly
    the fingerprint set of the pure-JVM array twin."""
    from fuzzy_item_matching_spark.operators.dedup import (
        winnowing_fingerprints,
        winnowing_fingerprints_native,
    )
    from fuzzy_item_matching_spark.tables import load_table

    d = load_table(spark, SF_CHECK, "documents").select(
        "doc_id", F.lower(F.col("text")).alias("txt")
    )
    kern = winnowing_fingerprints(d)
    nat = winnowing_fingerprints_native(d)
    assert kern.exceptAll(nat).count() == 0
    assert nat.exceptAll(kern).count() == 0
    assert kern.count() > 0


def test_gram_partials_equal_jvm_expression(spark):
    """The Arrow/numpy fixed-point Gram fold must reproduce the JVM
    expression path's BIGINT cell sums exactly."""
    from fuzzy_item_matching_spark.queries.vectors import (
        _gram_long_partials,
    )
    from fuzzy_item_matching_spark.tables import load_table

    e = load_table(spark, SF_CHECK, "embeddings")
    arrow = (
        _gram_long_partials(e)
        .groupBy("i", "j")
        .agg(F.sum("s").alias("s"))
    )
    q = 2.0**40
    jvm = (
        e.select(
            F.size("embedding").alias("d"),
            F.posexplode(
                F.expr(
                    "flatten(transform(cast(embedding as array<double>),"
                    " x -> transform(cast(embedding as array<double>),"
                    " y -> x * y)))"
                )
            ).alias("pos", "p"),
        )
        .select(
            F.expr("(pos div d) + 1").alias("i"),
            F.expr("(pos % d) + 1").alias("j"),
            "p",
        )
        .groupBy("i", "j")
        .agg(F.sum(F.floor(F.col("p") * q)).alias("s"))
    )
    assert arrow.exceptAll(jvm).count() == 0
    assert jvm.exceptAll(arrow).count() == 0


def test_jaccard_length_filter_no_pair_lost(spark):
    """The length-filtered postings join must emit exactly the pairs
    of an unfiltered reference join (same jaccard values)."""
    from fuzzy_item_matching_spark.functions.text import regex_tokenize
    from fuzzy_item_matching_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )
    from fuzzy_item_matching_spark.tables import load_table

    d = load_table(spark, SF_CHECK, "documents")
    got = ngram_jaccard_pairs(
        d, "doc_id", regex_tokenize("text"), n=3, min_jaccard=0.5
    )
    # reference: plain unfiltered postings join, written inline
    from fuzzy_item_matching_spark.operators.dedup import word_shingles

    sh = d.select(
        F.col("doc_id").alias("__id"),
        F.explode(
            F.array_sort(word_shingles(regex_tokenize("text"), 3))
        ).alias("__g"),
    )
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("__n"))
    a = sh.select(F.col("__id").alias("id_a"), "__g")
    b = sh.select(F.col("__id").alias("id_b"), "__g")
    inter = (
        a.join(b, "__g")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__i"))
    )
    ref = (
        inter.join(
            sizes.select(F.col("__id").alias("id_a"), F.col("__n").alias("na")),
            "id_a",
        )
        .join(
            sizes.select(F.col("__id").alias("id_b"), F.col("__n").alias("nb")),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.col("__i").cast("double")
            / (F.col("na") + F.col("nb") - F.col("__i")),
        )
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b", "jaccard")
    )
    assert got.exceptAll(ref).count() == 0
    assert ref.exceptAll(got).count() == 0
