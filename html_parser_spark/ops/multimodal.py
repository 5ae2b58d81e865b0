"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

Per the build brief: the decode step is STUBBED (no image/audio libs in this
container) behind ``NotImplementedError`` or a clearly-marked deterministic
fake — but the Spark-side plumbing (schema, partitioning, ``mapInPandas``
batch shape, UDF signatures) is real and tested.

Layout mirrors a production media lake:

    media(media_id BIGINT, doc_id BIGINT, kind STRING, payload BINARY,
          meta STRUCT<mime STRING, width INT, height INT, duration_ms INT>)

``decode_features`` is the extension point: swap ``_fake_decode`` for a
Pillow/torchaudio call and nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload_sha1", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def synth_media_df(spark: SparkSession, n: int = 100) -> DataFrame:
    """Deterministic fake media table (payload bytes are a pure function of
    media_id) — stands in for a real object-store-backed table."""
    base = spark.range(n).withColumnRenamed("id", "media_id")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.col("media_id"), F.lit(3)) + 1).cast("int"),
    )
    payload = F.encode(
        F.concat(F.lit("MEDIA"), F.repeat(F.md5(F.col("media_id").cast("string")), 8)),
        "UTF-8",
    )
    return base.select(
        "media_id",
        F.pmod(F.col("media_id"), F.lit(50)).alias("doc_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            (F.col("media_id") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def real_decode(payload: bytes, kind: str):
    """THE STUB: a real deployment decodes here (Pillow / torchaudio /
    pyav).  Those libs are not in this container."""
    raise NotImplementedError(
        f"media decode for kind={kind!r} requires image/audio libs not "
        "present in this environment; see _fake_decode for the wired fake"
    )


def _fake_decode(payload: bytes, kind: str) -> list[float]:
    """Deterministic fake feature extractor: FEATURE_DIM floats derived from
    the payload digest — keeps the whole pipeline testable end-to-end."""
    digest = hashlib.sha1(payload).digest()
    return [digest[i % len(digest)] / 255.0 for i in range(FEATURE_DIM)]


def decode_features(media: DataFrame, use_fake: bool = True) -> DataFrame:
    """mapInPandas over Arrow batches: payload bytes → feature vector.
    Batch shape: the iterator yields column-pruned pandas frames, one output
    row per input row — the canonical media-decode plumbing."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _fake_decode if use_fake else real_decode
        for pdf in it:
            rows = []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                raw = bytes(payload) if payload is not None else b""
                rows.append(
                    {
                        "media_id": media_id,
                        "kind": kind,
                        "payload_sha1": hashlib.sha1(raw).hexdigest(),
                        "n_bytes": len(raw),
                        "features": decode(raw, kind),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURES_SCHEMA.fields])

    pruned = media.select("media_id", "kind", "payload")  # column pruning at scan
    return pruned.mapInPandas(batches, FEATURES_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: rows (media_id, frame_ts_ms) — the fan-out
    is computed JVM-side from metadata; the actual frame decode would run in
    ``decode_features`` per sampled frame."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                       F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
