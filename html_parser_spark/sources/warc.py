"""WARC (ISO 28500) source + sink — the Common-Crawl container format.

The north-rule input is "an Iceberg table of Common-Crawl-style web pages
(url, warc_ts, html, …)"; this module is the ingest edge that LANDS crawl
archives into that table, and the export edge that writes one back out:

    read_warc(spark, "s3://commoncrawl/.../*.warc.gz")   →  pages DataFrame
    write_warc_files(pages, out_dir)                     →  part-*.warc.gz

Design for 100 TB:

* **One WARC file = one task.** ``binaryFile`` does not split files, which
  is exactly right here: Common Crawl shards are ~1 GB ``.warc.gz`` files
  and gzip members must be scanned sequentially anyway.  100 TB ≈ 100k
  files ≈ 100k map tasks, no shuffle anywhere in the ingest.  (Mind
  ``spark.sql.sources.binaryFile.maxLength`` — 2 GB hard cap per file.)
* **Record SERIALIZATION is pure column expressions** (concat/encode/md5 —
  whole-stage codegen); Python appears only for per-record gzip members
  (Arrow-batched pandas UDF, ~100 MB/s/core — comparable to the gzip cost
  itself) and for the record PARSER (mapInPandas; gzip inflate + header
  scan are byte-bound, not row-bound).
* **Per-record gzip members** (the Common Crawl layout): a ``.warc.gz`` is
  a concatenation of independently-deflated members, so a future range
  reader can seek to member boundaries; concatenating part files with
  ``cat`` yields a valid archive.
* **Parsing trusts Content-Length, not delimiters** — bodies may contain
  ``\\r\\n\\r\\n`` or even ``WARC/1.0``; the test plants both.

Record layout written (and accepted back):

    WARC/1.0\\r\\n  WARC-Type/Record-ID/Date/Target-URI, Content-Type:
    application/http; msgtype=response, Content-Length\\r\\n\\r\\n
    HTTP/1.1 200 OK … \\r\\n\\r\\n <body bytes> \\r\\n\\r\\n

``WARC-Record-ID`` is a deterministic uuid derived from ``md5(url)`` so a
re-run writes byte-identical uncompressed records (idempotent sink).
"""

from __future__ import annotations

import gzip
import os
import zlib
from collections.abc import Iterator
from datetime import datetime

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

WARC_DATE_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"
_PY_DATE_FMT = "%Y-%m-%dT%H:%M:%SZ"

WARC_PAGE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("source_file", T.StringType()),
    ]
)


# ---------------------------------------------------------------- writer ---


def _uuid_from_md5(url_col):
    m = F.md5(url_col)
    return F.concat_ws(
        "-",
        F.substring(m, 1, 8),
        F.substring(m, 9, 4),
        F.substring(m, 13, 4),
        F.substring(m, 17, 4),
        F.substring(m, 21, 12),
    )


def warc_record_col(url, warc_ts, html):
    """BINARY column holding one complete WARC response record.

    Entirely JVM-side (concat/encode/length/md5 → whole-stage codegen);
    ``F.length`` on BINARY counts bytes, so Content-Length is byte-exact
    for any payload."""
    http_head = F.concat_ws(
        "",
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8"),
        F.lit("\r\nContent-Length: "),
        F.length(html).cast("string"),
        F.lit("\r\n\r\n"),
    )
    http = F.concat(F.encode(http_head, "UTF-8"), html)
    warc_head = F.concat_ws(
        "",
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Record-ID: <urn:uuid:"),
        _uuid_from_md5(url),
        F.lit(">\r\nWARC-Date: "),
        F.date_format(warc_ts, WARC_DATE_FMT),
        F.lit("\r\nWARC-Target-URI: "),
        url,
        F.lit("\r\nContent-Type: application/http; msgtype=response"),
        F.lit("\r\nContent-Length: "),
        F.length(http).cast("string"),
        F.lit("\r\n\r\n"),
    )
    return F.concat(
        F.encode(warc_head, "UTF-8"), http, F.encode(F.lit("\r\n\r\n"), "UTF-8")
    )


@F.pandas_udf(T.BinaryType())
def _gzip_member_udf(rec: pd.Series) -> pd.Series:
    # mtime=0 → deterministic member bytes for a given record
    return rec.map(lambda b: gzip.compress(b, compresslevel=6, mtime=0))


def to_warc_records(pages: DataFrame, compress: bool = True) -> DataFrame:
    """pages(url, warc_ts, html, …) → one-column ``record`` BINARY frame."""
    rec = warc_record_col(F.col("url"), F.col("warc_ts"), F.col("html"))
    out = pages.select(rec.alias("record"))
    if compress:
        out = out.select(_gzip_member_udf("record").alias("record"))
    return out


def write_warc_files(pages: DataFrame, out_dir: str, compress: bool = True) -> int:
    """Sink: one ``part-NNNNN.warc[.gz]`` file per partition of ``pages``.

    Pure partition-parallel (`foreachPartition`), no shuffle: each task
    streams its records to a ``.tmp`` file and renames on success, so a
    retried task never leaves a half-written part visible (rename is atomic
    on POSIX; on an object store use the committer-staged path instead).
    Returns the number of part files written.  Concatenating the parts in
    any order is itself a valid WARC archive.
    """
    os.makedirs(out_dir, exist_ok=True)
    suffix = ".warc.gz" if compress else ".warc"
    records = to_warc_records(pages, compress=compress)

    def _write(rows) -> None:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        first = next(iter(rows), None)
        if first is None:  # empty partition → no file
            return
        final = os.path.join(out_dir, f"part-{ctx.partitionId():05d}{suffix}")
        tmp = f"{final}.tmp-{ctx.taskAttemptId()}"
        with open(tmp, "wb") as f:
            f.write(first["record"])
            for row in rows:
                f.write(row["record"])
        os.replace(tmp, final)

    records.foreachPartition(_write)
    return len([n for n in os.listdir(out_dir) if n.endswith(suffix)])


# ---------------------------------------------------------------- reader ---


def _gunzip_members(blob: bytes) -> bytes:
    """Inflate a concatenation of gzip members (the .warc.gz layout)."""
    out, buf = [], blob
    while buf:
        d = zlib.decompressobj(31)  # 16+15: gzip wrapper, 32KB window
        out.append(d.decompress(buf))
        out.append(d.flush())
        if not d.eof:
            raise ValueError("truncated gzip member in WARC file")
        buf = d.unused_data
    return b"".join(out)


def iter_warc_records(blob: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers, payload) per record from raw .warc / .warc.gz bytes.

    Payload extent comes from ``Content-Length`` alone — never from
    scanning for a delimiter — so bodies containing CRLFCRLF or literal
    ``WARC/1.0`` parse correctly."""
    data = _gunzip_members(blob) if blob[:2] == b"\x1f\x8b" else blob
    pos, n = 0, len(data)
    while pos < n:
        while data.startswith(b"\r\n", pos):
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"expected WARC/ header at offset {pos}")
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError("unterminated WARC header block")
        headers: dict[str, str] = {}
        for line in data[pos:head_end].decode("utf-8", "replace").split("\r\n")[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        clen = int(headers["content-length"])
        body_start = head_end + 4
        payload = data[body_start : body_start + clen]
        if len(payload) != clen:
            raise ValueError("truncated WARC record payload")
        pos = body_start + clen
        yield headers, payload


def _split_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, body) from an application/http payload."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0 or not payload.startswith(b"HTTP/"):
        return None, None, payload
    head = payload[:sep].decode("utf-8", "replace").split("\r\n")
    try:
        status = int(head[0].split(" ", 2)[1])
    except (IndexError, ValueError):
        status = None
    ctype = None
    for line in head[1:]:
        k, _, v = line.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
            break
    return status, ctype, payload[sep + 4 :]


def _parse_files(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = [f.name for f in WARC_PAGE_SCHEMA.fields]
    for pdf in batches:
        rows: dict[str, list] = {c: [] for c in cols}
        for path, content in zip(pdf["path"], pdf["content"]):
            for headers, payload in iter_warc_records(bytes(content)):
                wtype = headers.get("warc-type", "")
                if wtype == "response":
                    status, ctype, body = _split_http(payload)
                else:  # resource / conversion / … records carry raw bodies
                    status, ctype, body = None, headers.get("content-type"), payload
                ts = headers.get("warc-date")
                rows["url"].append(headers.get("warc-target-uri"))
                rows["warc_ts"].append(
                    datetime.strptime(ts, _PY_DATE_FMT) if ts else None
                )
                rows["html"].append(body)
                rows["content_type"].append(ctype)
                rows["http_status"].append(status)
                rows["warc_type"].append(wtype)
                rows["record_id"].append(headers.get("warc-record-id"))
                rows["source_file"].append(path)
        yield pd.DataFrame(rows, columns=cols)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Crawl archive(s) → pages DataFrame (url, warc_ts, html, …).

    ``binaryFile`` scan (one row/task per file, never split) → ONE
    mapInPandas stage.  The result feeds ``spark.pipeline.extract_pages``
    directly or lands into the Iceberg pages table via a plain write —
    either way the whole ingest is a shuffle-free map."""
    reader = spark.read.format("binaryFile")
    head, tail = os.path.split(path)
    if "*" in tail and "*" not in head:
        # dir + pathGlobFilter instead of a raw glob: same files, but the
        # source's streaming-metadata probe doesn't stat the literal
        # wildcard path (noisy FileNotFound WARN in driver logs)
        reader = reader.option("pathGlobFilter", tail)
        path = head
    files = reader.load(path)
    return files.select("path", "content").mapInPandas(
        _parse_files, schema=WARC_PAGE_SCHEMA
    )
