"""Multimodal (binary) column operators — image/audio/video plumbing.

A 100 TB training-data pipeline carries media as opaque ``binary``
columns with typed metadata, decoded/feature-extracted via Arrow-batched
Python (`mapInPandas`) because no Catalyst builtin decodes media. This
module makes all the Spark-side plumbing real — schemas, batch
iteration, partition behavior — while the actual codec call is STUBBED
(Pillow/librosa/ffmpeg are not in this container):

- ``decode_image_stub=False`` (default) runs a DETERMINISTIC fake
  decode derived from the payload bytes, so the whole path is testable
  and even oracle-checkable end-to-end.
- ``real_decode=True`` raises NotImplementedError at the exact call
  site where PIL.Image.open(BytesIO(payload)) would go.

The batch shape is the part that matters at scale: one Arrow batch in,
one pandas DataFrame out, constant memory per executor thread, media
bytes never cross a shuffle (metadata-only projections feed joins).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes int, width int, height int, aspect double"
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary column + typed metadata struct — the
    storage shape for media at scale (payload stays a black box;
    metadata is columnar and prunable)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(payload).alias("n_bytes"),
        ),
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image codec: derive dimensions
    from the first two payload bytes. REAL decode goes here:
    ``img = PIL.Image.open(io.BytesIO(payload)); return img.size``."""
    b0 = payload[0] if len(payload) > 0 else 0
    b1 = payload[1] if len(payload) > 1 else 0
    return (b0 % 8 + 1) * 16, (b1 % 8 + 1) * 16


def extract_image_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    real_decode: bool = False,
) -> DataFrame:
    """Arrow-batched media decode → feature rows (mapInPandas).

    Output schema is fixed (IMAGE_FEATURE_SCHEMA); each input batch
    maps to one output frame — the decode is embarrassingly parallel
    per partition, no shuffle. This is pattern (b) from the build
    brief: built-ins can't express the semantics, so the Python hop is
    vectorized and batch-scoped, never row-at-a-time.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "real image decode requires Pillow; install and replace "
                    "_fake_decode with PIL.Image.open(BytesIO(payload)).size"
                )
            dims = [_fake_decode(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "n_bytes": [len(bytes(p)) for p in pdf[payload_col]],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                    "aspect": [w / h for w, h in dims],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        decode_batches, schema=IMAGE_FEATURE_SCHEMA
    )


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    n_bytes_col: str = "n_bytes",
    frame_stride: int = 64,
) -> DataFrame:
    """Video-style frame sampling as pure plan ops: one row per sampled
    frame offset (posexplode of a bounded sequence). The decode of each
    frame would be another mapInPandas hop; the index math — the part
    that determines shuffle/fanout — is JVM-side."""
    n_frames = (F.col(n_bytes_col) / frame_stride).cast("int") + 1
    return df.select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1),
                lambda i: i * frame_stride,
            )
        ).alias("frame_idx", "byte_offset"),
    )


AUDIO_WINDOW_SCHEMA = (
    "doc_id bigint, win int, n_samples int, sum_v bigint, peak int,"
    " mean_v double"
)


def extract_audio_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    window: int = 32,
    real_decode: bool = False,
) -> DataFrame:
    """Audio-style windowed feature extraction: fake-decode the payload
    as unsigned 8-bit PCM (REAL decode — librosa/soundfile — would go
    at the marked call site) and emit one row per non-overlapping
    ``window``-sample frame with count/sum/peak/mean.

    This is the one-to-many mapInPandas shape (decode + fan-out in one
    Arrow hop, numpy-vectorized per batch) that complements
    extract_image_features' one-to-one shape: the fan-out happens
    INSIDE the Python batch, so no explode shuffle carries payload
    bytes, and downstream per-window aggregations group on (doc, win)
    keys only. Window stats use integer accumulators so the mean is a
    single exact division — oracle-checkable cross-engine.
    """
    import numpy as np

    def win_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "real audio decode requires soundfile/librosa; replace "
                    "np.frombuffer with sf.read(BytesIO(payload))"
                )
            out: dict[str, list] = {
                "doc_id": [],
                "win": [],
                "n_samples": [],
                "sum_v": [],
                "peak": [],
                "mean_v": [],
            }
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                samples = np.frombuffer(bytes(payload), dtype=np.uint8)
                for w in range((len(samples) + window - 1) // window):
                    chunk = samples[w * window : (w + 1) * window]
                    if len(chunk) == 0:
                        continue
                    s = int(chunk.sum(dtype=np.int64))
                    out["doc_id"].append(doc_id)
                    out["win"].append(w)
                    out["n_samples"].append(len(chunk))
                    out["sum_v"].append(s)
                    out["peak"].append(int(chunk.max()))
                    out["mean_v"].append(s / len(chunk))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(
        win_batches, schema=AUDIO_WINDOW_SCHEMA
    )
