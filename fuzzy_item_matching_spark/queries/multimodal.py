"""Multimodal queries: binary payload metadata, REAL container decode
(BMP/WAV), frame sampling (large-scale-pipeline extension; see
operators/multimodal.py for the codec tiers).

The image/audio queries build genuine uncompressed containers from
document bytes and PARSE them back — so the mapInPandas hop exercises
a real bytes→pixels/samples path while staying exactly
oracle-checkable: the builder∘parser roundtrip is content-preserving,
and DuckDB replays the underlying byte arithmetic via ascii().
documents.text is ASCII, so utf-8 byte lengths equal char lengths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fuzzy_item_matching_spark.operators.multimodal import (
    with_bmp_payload,
    with_wav_payload,
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
    WITH dims AS (
      SELECT doc_id, text, length(text) AS tl,
             (ascii(substring(text, 1, 1)) % 8 + 1) * 8 AS w,
             (ascii(substring(text, 2, 1)) % 8 + 1) * 8 AS h
      FROM documents
    ),
    geo AS (
      SELECT doc_id, text, tl, w, h,
             3 * w * h AS needed,
             (3 * w + 3) // 4 * 4 AS stride
      FROM dims
    ),
    sums AS (
      SELECT g.doc_id,
             SUM(ascii(substring(g.text, c.i, 1))) AS sum_all,
             SUM(CASE WHEN c.i <= g.needed % g.tl
                      THEN ascii(substring(g.text, c.i, 1)) ELSE 0 END)
               AS sum_prefix
      FROM geo g, LATERAL (
        SELECT unnest(generate_series(1, g.tl)) AS i
      ) c
      WHERE g.tl > 0
      GROUP BY g.doc_id
    )
    SELECT g.doc_id,
           CAST(54 + g.stride * g.h AS INT) AS n_bytes,
           CAST(g.w AS INT) AS width,
           CAST(g.h AS INT) AS height,
           g.w::DOUBLE / g.h AS aspect,
           CAST(CASE WHEN g.tl = 0 THEN 0
                     ELSE (g.needed // g.tl) * s.sum_all + s.sum_prefix
                END AS BIGINT) AS sum_px,
           (CASE WHEN g.tl = 0 THEN 0
                 ELSE (g.needed // g.tl) * s.sum_all + s.sum_prefix
            END)::DOUBLE / g.needed AS mean_px
    FROM geo g LEFT JOIN sums s ON g.doc_id = s.doc_id
    """,
)
def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL bytes→pixels decode via mapInPandas: each document's bytes
    are packed into a genuine 24-bit BMP container (fixture builder,
    operators/multimodal.py:with_bmp_payload), and the extractor
    PARSES it — BM signature, BITMAPINFOHEADER geometry, padded-row
    strip — then reduces the pixel plane to sum/mean features. The
    oracle replays the builder∘parser roundtrip arithmetically:
    dimensions from the first two bytes, pixel sums from the tiled
    byte cycle, container size from the BMP stride formula. The
    plumbing is the at-scale shape: binary column through an Arrow
    batch iterator, fixed output schema, partition-parallel, payload
    bytes never shuffled."""
    d = with_bmp_payload(load_table(spark, sf_dir, "documents"))
    return extract_image_features(d, real_decode=True)


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
    """REAL bytes→samples decode + per-32-sample-frame stats in ONE
    Arrow hop: each document's bytes are packed into a genuine
    RIFF/WAVE container (with_wav_payload) and the extractor PARSES it
    — signature check, word-aligned chunk walk, fmt validation, data
    extraction — before windowing (operators/multimodal.py). The
    one-to-many fan-out happens inside the Python batch so payload
    bytes never cross a shuffle; the output is keyed feature rows.
    Because the container roundtrip is sample-preserving, the oracle
    computes the identical window stats directly from the text bytes.
    """
    d = with_wav_payload(load_table(spark, sf_dir, "documents"))
    return extract_audio_windows(
        d.filter(F.length("text") > 0), real_decode=True
    )


@query(
    "mm_phash_pairs",
    oracle="""
    WITH g AS (
      SELECT doc_id, text, length(text) AS tl,
             (ascii(substring(text, 1, 1)) % 8 + 1) * 8 AS w,
             (ascii(substring(text, 2, 1)) % 8 + 1) * 8 AS h
      FROM documents WHERE length(text) > 0
    ),
    samp AS (
      SELECT doc_id, u.i AS idx,
             ascii(substring(text,
               ((((u.i // 8) * h) // 8) * 3 * w
                + (((u.i % 8) * w) // 8) * 3) % tl + 1,
               1)) AS v
      FROM g, LATERAL (SELECT unnest(generate_series(0, 63)) AS i) u(i)
    ),
    sums AS (SELECT doc_id, SUM(v) AS s FROM samp GROUP BY doc_id),
    chunks AS (
      SELECT samp.doc_id, idx // 8 AS band,
             CAST(SUM(CASE WHEN 64 * v > s
                           THEN 1 << (7 - (idx % 8)) ELSE 0 END) AS INT)
               AS chunk
      FROM samp JOIN sums USING (doc_id) GROUP BY 1, 2
    ),
    ok AS (
      SELECT band, chunk FROM chunks
      GROUP BY band, chunk
      HAVING 20 * COUNT(*) <= greatest(1280, (SELECT COUNT(*) FROM sums))
    ),
    pruned AS (
      SELECT c.doc_id, c.band, c.chunk
      FROM chunks c JOIN ok USING (band, chunk)
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
      FROM pruned x JOIN pruned y
        ON x.band = y.band AND x.chunk = y.chunk AND x.doc_id < y.doc_id
    ),
    wide AS (
      SELECT doc_id, list(chunk ORDER BY band) AS cs FROM chunks GROUP BY doc_id
    )
    SELECT id_a, id_b, CAST(hm AS INT) AS hamming FROM (
      SELECT c.id_a, c.id_b,
             list_sum(list_transform(list_zip(a.cs, b.cs),
               p -> bit_count(xor(CAST(p[1] AS BIGINT),
                                  CAST(p[2] AS BIGINT))))) AS hm
      FROM cand c
      JOIN wide a ON a.doc_id = c.id_a
      JOIN wide b ON b.doc_id = c.id_b
    ) WHERE hm <= 6
    """,
)
def mm_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-dup pairs via perceptual average-hash — the standard
    image-dedup path a multimodal pipeline runs before training:
    REAL container decode (the BMP parser), 8×8 nearest-neighbor
    grayscale-channel sample, aHash bits (64·v > Σv — integer-exact,
    tie-free), then SimHash-style pigeonhole banding: 8 bands of
    8 bits guarantee recall for hamming ≤ 7, verified here at ≤ 6.
    Candidates come from a (band, chunk) equi-join, never all-pairs;
    the oracle replays decode-sample-hash-band end-to-end via ascii()
    byte arithmetic (the builder∘parser roundtrip is
    content-preserving, the mm_image_features property).

    Saturated chunks (e.g. 0xFF — all samples above the mean) bucket
    a constant fraction of the corpus, the quadratic hot-key failure
    mode at scale: hence the same df-pruning discipline as the
    similarity join's max_df_ratio (operators/similarity.py:219) —
    buckets holding > max(64, 5% of docs) members are dropped before
    the self-join, via the all-integer tie-free predicate
    20·df ≤ greatest(1280, n). The bucket whitelist is ≤ 8·256 rows
    by construction, so it broadcasts. Trade-off (documented, as for
    max_df): a pair whose ONLY matching band is saturated is missed —
    at 5 k docs that drops 3.5 M of 3.6 M candidate pairs while the
    survivor set keeps every structural collision pair.

    aHash is alignment-sensitive by design (byte-shifted variants
    hash apart — cropping/re-encoding robustness is what production
    pHash DCTs buy); on this fixture the survivors are structural
    byte-plane collisions."""
    d = with_bmp_payload(
        load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    )
    from fuzzy_item_matching_spark.operators.multimodal import (
        extract_image_ahash,
    )

    feat = extract_image_ahash(d).persist()
    banded = feat.select(
        "doc_id", F.posexplode("chunks").alias("band", "chunk")
    )
    tot = feat.agg(F.count("*").alias("__n"))
    ok = (
        banded.groupBy("band", "chunk")
        .agg(F.count("*").alias("__df"))
        .crossJoin(F.broadcast(tot))
        .filter(20 * F.col("__df") <= F.greatest(F.lit(1280), F.col("__n")))
        .select("band", "chunk")
    )
    pruned = banded.join(F.broadcast(ok), ["band", "chunk"])
    cand = (
        pruned.alias("x")
        .join(pruned.alias("y"), ["band", "chunk"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b")
        )
        .distinct()
    )
    a = feat.select(F.col("doc_id").alias("id_a"), F.col("chunks").alias("__ca"))
    b = feat.select(F.col("doc_id").alias("id_b"), F.col("chunks").alias("__cb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.aggregate(
                F.zip_with(
                    "__ca", "__cb",
                    lambda x, y: F.bit_count(x.bitwiseXOR(y)),
                ),
                F.lit(0),
                lambda acc, v: acc + v,
            )
            .cast("int")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= 6)
    )


_SC_FRAME = 32  # bytes per synthetic frame (mm_audio_windows' stride)
_SC_TAU = 96  # |Δ signature| scene-cut threshold


@query(
    "mm_scene_cuts",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, text,
             unnest(generate_series(0,
               CAST(floor((length(text) - 1) / {_SC_FRAME}.0) AS INT)))
               AS win
      FROM documents WHERE length(text) > 0
    ),
    sig AS (
      SELECT doc_id, win, SUM(v) AS sig FROM (
        SELECT doc_id, win,
               ascii(substring(text, win * {_SC_FRAME} + i, 1)) AS v
        FROM (
          SELECT doc_id, win, text,
                 unnest(generate_series(1,
                   least({_SC_FRAME}, length(text) - win * {_SC_FRAME})))
                   AS i
          FROM w
        )
      ) GROUP BY doc_id, win
    ),
    cuts AS (
      SELECT doc_id, win, sig,
             CASE WHEN lag(sig) OVER dw IS NULL THEN 1
                  WHEN abs(sig - lag(sig) OVER dw) > {_SC_TAU} THEN 1
                  ELSE 0 END AS is_cut
      FROM sig WINDOW dw AS (PARTITION BY doc_id ORDER BY win)
    ),
    scenes AS (
      SELECT doc_id, win, sig,
             SUM(is_cut) OVER (PARTITION BY doc_id ORDER BY win
                               ROWS UNBOUNDED PRECEDING) AS scene_id
      FROM cuts
    )
    SELECT doc_id, CAST(scene_id AS BIGINT) AS scene_id,
           CAST(MIN(win) AS BIGINT) AS start_frame,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(SUM(sig) AS BIGINT) AS scene_sig
    FROM scenes GROUP BY doc_id, scene_id
    """,
)
def mm_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video scene-cut detection over the synthetic frame stream —
    the shot-segmentation step a multimodal curation pipeline runs
    before sampling frames for captioning: per document the payload
    bytes split into {f}-byte frames (mm_audio_windows' stride), each
    frame reduces to an integer signature, a cut fires where the
    frame-to-frame signature jump exceeds {t} (LAG window), and
    consecutive frames between cuts merge into SCENES (running-sum
    scene ids — the gaps-and-islands discipline). Output one row per
    scene: (doc_id, scene_id, start_frame, n_frames, scene_sig).

    With a real codec the signature would be a perceptual frame hash
    (mm_phash_pairs' aHash) fed by the decoder tier — the Spark-side
    plumbing (frame fanout, per-frame reduce, LAG diff, island merge)
    is identical and is what this query pins.

    Scale shape: frame fanout is a bounded posexplode (n_bytes/{f}
    per doc); signatures are one map-side-combinable groupBy; the LAG
    + running-sum windows shuffle once on doc_id; scene assembly is a
    second combine. Integers end-to-end — exact oracle."""
    d = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    )
    frames = d.select(
        "doc_id",
        "text",
        F.posexplode(
            F.expr(
                "transform(sequence(0, cast(floor((length(text) - 1) /"
                f" {_SC_FRAME}.0) as int)), x -> x)"
            )
        ).alias("__p", "win"),
    )
    bytes_ = frames.select(
        "doc_id",
        "win",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, least({_SC_FRAME},"
                f" length(text) - win * {_SC_FRAME})),"
                f" i -> ascii(substring(text, win * {_SC_FRAME} + i, 1)))"
            )
        ).alias("__q", "v"),
    )
    sig = bytes_.groupBy("doc_id", "win").agg(F.sum("v").alias("sig"))
    dw = Window.partitionBy("doc_id").orderBy("win")
    cuts = sig.withColumn(
        "is_cut",
        F.when(F.lag("sig").over(dw).isNull(), 1)
        .when(F.abs(F.col("sig") - F.lag("sig").over(dw)) > _SC_TAU, 1)
        .otherwise(0),
    )
    scenes = cuts.withColumn(
        "scene_id",
        F.sum("is_cut").over(
            dw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return scenes.groupBy("doc_id", "scene_id").agg(
        F.min("win").alias("start_frame"),
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("sig").alias("scene_sig"),
    )


mm_scene_cuts.__doc__ = mm_scene_cuts.__doc__.format(
    f=_SC_FRAME, t=_SC_TAU
)


@query(
    "mm_image_resize",
    oracle="""
    WITH g AS (
      SELECT doc_id, text, length(text) AS tl,
             (ascii(substring(text, 1, 1)) % 8 + 1) * 8 AS w,
             (ascii(substring(text, 2, 1)) % 8 + 1) * 8 AS h
      FROM documents WHERE length(text) > 0
    )
    SELECT doc_id,
           CAST(u.i // 8 AS INT) AS py,
           CAST(u.i % 8 AS INT) AS px,
           ascii(substring(text,
             ((((u.i // 8) * h) // 8) * 3 * w
              + (((u.i % 8) * w) // 8) * 3) % tl + 1,
             1)) AS v
    FROM g, LATERAL (SELECT unnest(generate_series(0, 63)) AS i) u(i)
    """,
)
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image RESIZE (nearest-neighbor, 8×8 grayscale thumbnail) over
    the REAL BMP decode path — the brief's decode→resize tier as a
    materialized grid: the mapInPandas hop parses each container
    (header walk, padded-row strip) and resamples one blue-channel
    byte per target cell; output is the long-format thumbnail
    (doc_id, py, px, v) a multimodal feature store persists.
    extract_image_ahash consumes exactly this grid before hashing —
    here the resample itself is the product.

    Scale: decode is Arrow-batched and partition-local (no shuffle);
    fanout is a fixed 64 rows/doc. The oracle replays the builder∘
    parser roundtrip through integer ascii() arithmetic (the
    mm_phash_pairs sampling formula), so the REAL decode stays
    exactly checkable."""
    d = with_bmp_payload(
        load_table(spark, sf_dir, "documents").filter(
            F.length("text") > 0
        )
    )
    from fuzzy_item_matching_spark.operators.multimodal import (
        resize_image_nn,
    )

    return resize_image_nn(d)
