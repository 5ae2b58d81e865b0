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


# --- real header parsing for dependency-free formats ------------------------
#
# The heavy decode (pixel data, audio frames) stays behind real_decode's
# stub, but image IDENTITY — format, dimensions, bit depth — is plain
# struct/ASCII parsing for BMP, PPM/PGM, PNG, and GIF: no library needed,
# and at crawl scale header-sniffing is exactly what a media-curation pass
# runs over billions of blobs before deciding what to decode for real.


def parse_image_header(raw: bytes) -> dict | None:
    """bytes → {format, width, height, bit_depth} for BMP / PNG / GIF /
    PPM / PGM, or None when the magic matches nothing.  Pure stdlib
    (struct + ASCII), total on truncated input (None, never a raise)."""
    import struct

    try:
        if raw[:8] == b"\x89PNG\r\n\x1a\n" and len(raw) >= 26:
            w, h = struct.unpack(">II", raw[16:24])
            return {"format": "png", "width": w, "height": h,
                    "bit_depth": raw[24]}
        if raw[:2] == b"BM" and len(raw) >= 30:
            w, h = struct.unpack("<ii", raw[18:26])
            bpp = struct.unpack("<H", raw[28:30])[0]
            return {"format": "bmp", "width": w, "height": abs(h),
                    "bit_depth": bpp}
        if raw[:6] in (b"GIF87a", b"GIF89a") and len(raw) >= 10:
            w, h = struct.unpack("<HH", raw[6:10])
            return {"format": "gif", "width": w, "height": h, "bit_depth": 8}
        if raw[:2] in (b"P5", b"P6") and len(raw) > 2:
            # PNM: magic, then whitespace/comment-separated width height
            toks: list[bytes] = []
            i, n = 2, len(raw)
            while i < n and len(toks) < 2:
                c = raw[i:i + 1]
                if c == b"#":  # comment to EOL
                    while i < n and raw[i:i + 1] != b"\n":
                        i += 1
                elif c.isspace():
                    i += 1
                else:
                    j = i
                    while j < n and not raw[j:j + 1].isspace():
                        j += 1
                    toks.append(raw[i:j])
                    i = j
            if len(toks) == 2:
                return {
                    "format": "ppm" if raw[:2] == b"P6" else "pgm",
                    "width": int(toks[0]), "height": int(toks[1]),
                    "bit_depth": 8,
                }
    except (struct.error, ValueError, IndexError):
        return None
    return None


IMAGE_HEADER_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("bit_depth", T.IntegerType()),
    ]
)


def image_headers(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """media + (format, width, height, bit_depth) parsed from the payload's
    header bytes — NULL struct fields when the magic matches nothing.  One
    Arrow-batched UDF, no shuffle; the REAL counterpart of the decode
    stub's identity half."""

    @F.pandas_udf(IMAGE_HEADER_SCHEMA)
    def _udf(p: pd.Series) -> pd.DataFrame:
        from html_parser_spark.ops.multimodal import parse_image_header

        cols: dict[str, list] = {f.name: [] for f in IMAGE_HEADER_SCHEMA.fields}
        for b in p:
            r = parse_image_header(bytes(b) if b is not None else b"") or {}
            for k in cols:
                cols[k].append(r.get(k))
        return pd.DataFrame(cols, copy=False)

    out = media.withColumn("_ih", _udf(F.col(payload_col)))
    return out.select(
        *[c for c in media.columns],
        *[F.col(f"_ih.{f.name}").alias(f.name) for f in IMAGE_HEADER_SCHEMA.fields],
    )
