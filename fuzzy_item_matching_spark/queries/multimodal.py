"""Multimodal queries: binary payload metadata, Arrow-batched decode,
frame sampling (large-scale-pipeline extension; see
operators/multimodal.py for the stub-vs-real-codec contract).

The fake decode is deterministic from payload bytes, so even the
mapInPandas hop gets an EXACT oracle (DuckDB replicates the byte
arithmetic via ascii()). documents.text is ASCII, so utf-8 byte
lengths equal char lengths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fuzzy_item_matching_spark.operators.multimodal import (
    extract_audio_windows,
    extract_image_features,
    sample_frames,
    with_binary_payload,
)
from fuzzy_item_matching_spark.queries import query
from fuzzy_item_matching_spark.tables import load_table


@query(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id, 'application/octet-stream' AS mime,
           length(text) AS n_bytes
    FROM documents
    """,
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + typed metadata projection. Metadata lives in
    ordinary columns → prunable/filterable without touching payload
    bytes (the scan never deserializes media for metadata-only
    queries — the property that matters at 100 TB)."""
    d = with_binary_payload(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.col("media_meta.mime").alias("mime"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
    )


@query(
    "mm_image_features",
    oracle="""
    SELECT doc_id,
           length(text) AS n_bytes,
           (ascii(substring(text, 1, 1)) % 8 + 1) * 16 AS width,
           (ascii(substring(text, 2, 1)) % 8 + 1) * 16 AS height,
           ((ascii(substring(text, 1, 1)) % 8 + 1) * 16)::DOUBLE
             / ((ascii(substring(text, 2, 1)) % 8 + 1) * 16) AS aspect
    FROM documents
    """,
)
def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched 'decode' via mapInPandas (stubbed codec,
    deterministic byte-derived dimensions — exact oracle). The plumbing
    under test is the real thing: binary column through an Arrow batch
    iterator with a fixed output schema, partition-parallel."""
    d = with_binary_payload(load_table(spark, sf_dir, "documents"))
    return extract_image_features(d)


@query(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id, i - 1 AS frame_idx, (i - 1) * 64 AS byte_offset
    FROM (
      SELECT doc_id, unnest(generate_series(1, length(text) // 64 + 1)) AS i
      FROM documents
    )
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling index expansion (video decode prep): bounded
    posexplode per document — fanout is n_bytes/stride, JVM-side."""
    d = with_binary_payload(load_table(spark, sf_dir, "documents"))
    meta = d.select("doc_id", F.col("media_meta.n_bytes").alias("n_bytes"))
    return sample_frames(meta)


@query(
    "mm_audio_windows",
    oracle="""
    WITH w AS (
      SELECT doc_id, text,
             unnest(generate_series(0,
               CAST(floor((length(text) - 1) / 32.0) AS INT))) AS win
      FROM documents WHERE length(text) > 0
    ),
    s AS (
      SELECT doc_id, win,
             ascii(substring(text, win * 32 + i, 1)) AS v
      FROM (
        SELECT doc_id, win, text,
               unnest(generate_series(1,
                 least(32, length(text) - win * 32))) AS i
        FROM w
      )
    )
    SELECT doc_id, win,
           CAST(COUNT(*) AS INT) AS n_samples,
           CAST(SUM(v) AS BIGINT) AS sum_v,
           CAST(MAX(v) AS INT) AS peak,
           CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean_v
    FROM s GROUP BY doc_id, win
    """,
)
def mm_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio windowing: fake-PCM decode + per-32-sample-frame stats in
    ONE Arrow hop (operators/multimodal.py:extract_audio_windows) —
    the one-to-many mapInPandas shape. The fan-out happens inside the
    Python batch so payload bytes never cross a shuffle; the output is
    keyed feature rows. ASCII text payloads make the byte arithmetic
    exactly replicable in SQL (same contract as mm_image_features).
    """
    d = with_binary_payload(load_table(spark, sf_dir, "documents"))
    return extract_audio_windows(d.filter(F.length("text") > 0))
