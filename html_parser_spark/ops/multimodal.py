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


def _parse_pnm(raw: bytes):
    """P5/P6 (binary PGM/PPM) → (width, height, bytes_per_px, raster
    offset), or None.  Shares the header-token walk with
    :func:`parse_image_header` semantics: whitespace/comment separated
    width, height, maxval, then a single whitespace byte before the
    raster."""
    if raw[:2] not in (b"P5", b"P6"):
        return None
    toks: list[bytes] = []
    i, n = 2, len(raw)
    while i < n and len(toks) < 3:
        c = raw[i:i + 1]
        if c == b"#":
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
    if len(toks) < 3 or i >= n:
        return None
    try:
        w, h, maxval = int(toks[0]), int(toks[1]), int(toks[2])
    except ValueError:
        return None
    if w <= 0 or h <= 0 or maxval <= 0 or maxval > 255:
        return None
    return w, h, (3 if raw[:2] == b"P6" else 1), i + 1  # one ws after maxval


def dhash64(raw: bytes) -> int | None:
    """Perceptual difference-hash (dHash) over a PGM/PPM payload: sample a
    9×8 grid of gray pixels (nearest-neighbor; PPM grays via (r+g+b)//3),
    emit bit 1 where the right neighbor is brighter — 64 bits total,
    returned as a SIGNED 64-bit int (two's complement, BIGINT-storable).

    The image-side twin of embedding near-dup: visually identical crawl
    images hash equal (and near-identical ones within a few bits) no
    matter how they were re-encoded, so exact/near dedup over billions of
    blobs becomes a groupBy/banded-join on an 8-byte key.  Real pixel
    decode — no stub — for the dependency-free PNM formats; other formats
    return None until `real_decode` gets a library."""
    p = _parse_pnm(raw)
    if p is None:
        return None
    w, h, bpp, off = p
    if len(raw) < off + w * h * bpp:
        return None  # truncated raster

    def gray(x: int, y: int) -> int:
        base = off + (y * w + x) * bpp
        if bpp == 1:
            return raw[base]
        return (raw[base] + raw[base + 1] + raw[base + 2]) // 3

    bits = 0
    for gy in range(8):
        y = gy * h // 8
        row = [gray(gx * w // 9, y) for gx in range(9)]
        for gx in range(8):
            bits = (bits << 1) | (1 if row[gx + 1] > row[gx] else 0)
    return bits - (1 << 64) if bits >= (1 << 63) else bits  # two's complement


def image_dhash(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """media + ``dhash`` BIGINT column (NULL for non-PNM payloads).  One
    Arrow-batched UDF, no shuffle; downstream near-dup is then
    ``groupBy('dhash')`` for exact perceptual dups or a banded join over
    16-bit hash slices for hamming-distance candidates — identical shapes
    to ops/dedup.py's SimHash path."""

    @F.pandas_udf(T.LongType())
    def _udf(p: pd.Series) -> pd.Series:
        from html_parser_spark.ops.multimodal import dhash64

        # build via pd.array with the nullable Int64 dtype: Series.map
        # would infer float64 for an int+None result and silently round
        # the low ~11 bits of every 64-bit hash before any astype
        vals = [dhash64(bytes(b)) if b is not None else None for b in p]
        return pd.Series(pd.array(vals, dtype="Int64"), index=p.index)

    return media.withColumn("dhash", _udf(F.col(payload_col)))


def parse_audio_header(raw: bytes) -> dict | None:
    """bytes → {format, channels, sample_rate, bits_per_sample,
    bitrate_kbps, duration_ms} for WAV/RIFF and MP3 frame headers, or None
    when the magic matches nothing.  Pure stdlib, total on truncated input
    (None, never a raise) — the audio twin of :func:`parse_image_header`.

    WAV: walks RIFF chunks (word-aligned) to the ``fmt `` block;
    ``duration_ms`` comes from the DECLARED ``data`` size over byte rate,
    so a header-only sniff (first KB of a blob) still yields it.
    MP3: skips an ID3v2 tag (syncsafe size), then decodes the first frame
    header — MPEG version / layer / bitrate / sample-rate tables per the
    published frame format; bits_per_sample is NULL (lossy codec) and
    duration is NULL (needs the full stream)."""
    import struct

    try:
        if raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
            i, n = 12, len(raw)
            fmt = None
            data_size = None
            while i + 8 <= n:
                cid = raw[i:i + 4]
                size = struct.unpack("<I", raw[i + 4:i + 8])[0]
                if cid == b"fmt " and i + 24 <= n:
                    ch, sr, byte_rate = struct.unpack(
                        "<HII", raw[i + 10:i + 20]
                    )
                    bits = struct.unpack("<H", raw[i + 22:i + 24])[0]
                    fmt = (ch, sr, byte_rate, bits)
                elif cid == b"data":
                    data_size = size
                if fmt is not None and data_size is not None:
                    break
                i += 8 + size + (size & 1)  # chunks are word-aligned
            if fmt is None:
                return None
            ch, sr, byte_rate, bits = fmt
            return {
                "format": "wav",
                "channels": ch,
                "sample_rate": sr,
                "bits_per_sample": bits,
                "bitrate_kbps": byte_rate * 8 // 1000 if byte_rate else None,
                "duration_ms": (
                    data_size * 1000 // byte_rate
                    if data_size is not None and byte_rate
                    else None
                ),
            }
        i = 0
        if raw[:3] == b"ID3" and len(raw) >= 10:
            ss = raw[6:10]
            if max(ss) < 0x80:  # syncsafe: high bit clear per byte
                i = 10 + ((ss[0] << 21) | (ss[1] << 14) | (ss[2] << 7) | ss[3])
        if len(raw) >= i + 4 and raw[i] == 0xFF and (raw[i + 1] & 0xE0) == 0xE0:
            b1, b2, b3 = raw[i + 1], raw[i + 2], raw[i + 3]
            version = (b1 >> 3) & 3  # 0=MPEG2.5, 1=reserved, 2=MPEG2, 3=MPEG1
            layer = (b1 >> 1) & 3    # 0=reserved, 1=III, 2=II, 3=I
            br_idx = b2 >> 4
            sr_idx = (b2 >> 2) & 3
            if version == 1 or layer == 0 or br_idx in (0, 15) or sr_idx == 3:
                return None  # reserved/free/bad combinations: not a frame
            sr = {
                3: (44100, 48000, 32000),
                2: (22050, 24000, 16000),
                0: (11025, 12000, 8000),
            }[version][sr_idx]
            v1 = {
                1: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
                2: (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
                3: (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
            }
            v2 = {
                3: (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
            }
            v2l23 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
            table = v1[layer] if version == 3 else v2.get(layer, v2l23)
            return {
                "format": "mp3",
                "channels": 1 if (b3 >> 6) == 3 else 2,
                "sample_rate": sr,
                "bits_per_sample": None,
                "bitrate_kbps": table[br_idx],
                "duration_ms": None,
            }
    except (struct.error, ValueError, IndexError):
        return None
    return None


AUDIO_HEADER_SCHEMA = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("bitrate_kbps", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)


def audio_headers(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """media + WAV/MP3 identity columns parsed from the payload's header
    bytes — NULL fields when the magic matches nothing.  One Arrow-batched
    UDF, no shuffle; same shape as :func:`image_headers`."""

    @F.pandas_udf(AUDIO_HEADER_SCHEMA)
    def _udf(p: pd.Series) -> pd.DataFrame:
        from html_parser_spark.ops.multimodal import parse_audio_header

        cols: dict[str, list] = {f.name: [] for f in AUDIO_HEADER_SCHEMA.fields}
        for b in p:
            r = parse_audio_header(bytes(b) if b is not None else b"") or {}
            for k in cols:
                cols[k].append(r.get(k))
        return pd.DataFrame(cols, copy=False)

    out = media.withColumn("_ah", _udf(F.col(payload_col)))
    return out.select(
        *[c for c in media.columns],
        *[F.col(f"_ah.{f.name}").alias(f.name) for f in AUDIO_HEADER_SCHEMA.fields],
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
