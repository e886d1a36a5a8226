"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata.

The decode step is STUBBED (the container has no image/audio libraries): a
clearly-marked deterministic fake stands in for pixel decoding, while the
Spark-side plumbing — binary schema, Arrow batch shape through mapInPandas,
metadata extraction, frame sampling arithmetic — is real and tested. Swap
``_decode_stub`` for a PIL/ffmpeg call on a real cluster; nothing else
changes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_binary(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Synthesize an opaque binary column from text bytes (test stand-in for
    real image/audio payloads); schema (media_id, payload binary)."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def _decode_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """DETERMINISTIC FAKE DECODE — stands in for PIL.Image.open/librosa.load.

    Derives a fake (width, height) and an 8-float feature vector from the
    payload's sha256 so tests are reproducible. Replace with a real decoder
    on a cluster with media libraries installed.
    """
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 64
    height = 64 + digest[1] % 64
    feature = [b / 255.0 for b in digest[2:10]]
    return width, height, feature


def decode_media(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas over Arrow batches: binary payload -> typed metadata +
    feature vector. The batch shape (pandas DataFrame of bytes objects in,
    DataFrame out) is exactly what a real decoder UDF uses.

    The input fans out to the session's parallelism when its scan yields
    fewer partitions (guide §2.5): per-payload decode + sha256 is the
    textbook compute-amplifying Python stage, and a one-file corpus scan
    would otherwise pin every Python worker's work onto one task."""
    from arachne_spark.functions._parallel import fan_out

    media = fan_out(media)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            metas = pdf["payload"].map(
                lambda b: _decode_stub(bytes(b))
            )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "sha256": pdf["payload"].map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "width": metas.map(lambda m: m[0]).astype("int32"),
                    "height": metas.map(lambda m: m[1]).astype("int32"),
                    "feature": metas.map(lambda m: m[2]),
                }
            )
            yield out

    return media.mapInPandas(batches, MEDIA_META_SCHEMA)


def frame_sample_plan(
    media_meta: DataFrame, fps: float = 1.0, duration_col: str | None = None
) -> DataFrame:
    """Frame-sampling arithmetic for video payloads: given (media_id, n_bytes)
    and a fake duration proxy (n_bytes / 1024 seconds when no duration column
    exists), emit one row per sampled frame timestamp — the explode pattern a
    real video pipeline uses before per-frame decode."""
    dur = (
        F.col(duration_col)
        if duration_col
        else (F.col("n_bytes") / 1024.0)
    )
    return media_meta.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.floor(dur * fps).cast("int") - 1, F.lit(0)),
            )
        ).alias("frame_idx"),
    ).withColumn("ts_sec", F.col("frame_idx") / fps)


def resize_stub(media_meta: DataFrame, target: int = 224) -> DataFrame:
    """Resize metadata arithmetic (aspect-preserving shorter-side=target);
    the pixel work is the stubbed decode's job. Raises NotImplementedError
    via decode if real pixels are requested."""
    ratio = F.least(F.col("width"), F.col("height")) / F.lit(float(target))
    return media_meta.select(
        "media_id",
        F.round(F.col("width") / ratio).cast("int").alias("resized_w"),
        F.round(F.col("height") / ratio).cast("int").alias("resized_h"),
    )


def real_decode_unavailable() -> None:
    """The genuine decoder entry point — explicitly not available here."""
    raise NotImplementedError(
        "real image/audio decoding requires PIL/librosa/ffmpeg, which are not "
        "installed in this environment; _decode_stub provides the "
        "deterministic fake used by tests"
    )
