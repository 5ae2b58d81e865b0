"""Deterministic synthesis of the Common-Crawl-style ``pages`` table.

Schema per BASELINE.json input_hint:
    url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING

Two row groups (FIXTURES.md §1):

* fixture rows — the reference repo's own 372 sample dictionary pages
  (read-only at /root/reference), exact file bytes (the rus-lez pages stay
  windows-1251; the kernel decodes from the meta tag);
* filler rows — deterministically derived from the driver's ``documents``
  parquet (seed-free: content is a pure function of doc_id/text), generated
  DISTRIBUTED via Spark SQL expressions — no driver-side loop, so the same
  code synthesizes 10^12 rows on a real cluster.

``warc_ts`` is a fixed epoch + doc_id seconds — no ``now()`` anywhere.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

WARC_EPOCH = 1722988800  # 2024-08-07T00:00:00Z (reference snapshot date)

_FIXTURE_GROUPS = [
    # (dir, prefix filter, suffix filter, lang) — mirrors the reference's own
    # scans: htmlReader.ts:27-28 endsWith, rus-lez-35k/parser.js:92 startsWith
    ("lez-rus-35k/dictionary/letters", "", ".html", "lez"),
    ("rus-lez-35k/dictionary", "BUKVA", ".HTM", "rus"),
    ("tab-rus-25k/dictionary", "", ".html", "tab"),
    ("lez-eng/dictionary", "", ".html", "eng"),
]

REFERENCE_ROOT = os.environ.get("SPARK_GRAFT_REFERENCE", "/root/reference")


def fixture_pages_rows() -> list[tuple]:
    """Driver-side read of the 372 fixture files (34MB — fine on the driver;
    these exist only for golden correctness, not scale)."""
    rows = []
    i = 0
    for subdir, prefix, suffix, lang in _FIXTURE_GROUPS:
        d = os.path.join(REFERENCE_ROOT, subdir)
        if not os.path.isdir(d):
            continue
        for name in sorted(os.listdir(d)):
            if not name.endswith(suffix) or not name.startswith(prefix):
                continue
            path = os.path.join(d, name)
            if not os.path.isfile(path):
                continue
            with open(path, "rb") as f:
                raw = f.read()
            rows.append(
                (f"file:///{subdir}/{name}", WARC_EPOCH + i, bytearray(raw), None, lang)
            )
            i += 1
    return rows


def fixture_pages_df(spark: SparkSession) -> DataFrame:
    rows = fixture_pages_rows()
    df = spark.createDataFrame(
        rows, "url string, _ts long, html binary, text string, lang string"
    )
    return df.select(
        "url", F.timestamp_seconds("_ts").alias("warc_ts"), "html", "text", "lang"
    )


def _esc(col):
    c = F.regexp_replace(col, "&", "&amp;")
    c = F.regexp_replace(c, "<", "&lt;")
    return F.regexp_replace(c, ">", "&gt;")


def synthetic_pages_df(
    spark: SparkSession, sf_dir: str, copies: int = 1, paragraphs: int = 10
) -> DataFrame:
    """documents.parquet → format-A-shaped pages, one per document × copies.

    Pure-SQL generation (whole-stage codegen, zero Python) so the same
    expression scales to any row count.  ``copies > 1`` multiplies the corpus
    for bench runs without changing per-doc content (url gets a copy suffix).
    ``paragraphs`` repeats the entry block so page size (~8KB at the default)
    matches real Common-Crawl documents rather than tweet-sized stubs —
    per-row fixed costs (Arrow framing, scheduling) must not dominate the
    benchmark.
    """
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    if copies > 1:
        docs = docs.crossJoin(
            spark.range(copies).withColumnRenamed("id", "copy")
        )
    else:
        docs = docs.withColumn("copy", F.lit(0))
    # one dictionary-entry block: headword line + ♦ example continuation line
    entry_block = F.concat(
        F.lit('<p class="af1"><span class="af">DOC'),
        F.col("doc_id").cast("string"),
        F.lit('</span><span class="af2"> </span><span class="a1">сущ</span>. '),
        _esc(F.substring(F.col("text"), 1, 2000)),
        F.lit("</p>\n"),
        F.lit('<p class="af1">♦ <span class="aff0">'),
        _esc(F.substring(F.col("text"), 1, 80)),
        F.lit('</span> <span class="a1">перен</span>. '),
        _esc(F.substring(F.col("text"), 81, 200)),
        F.lit("</p>\n"),
    )
    body = F.concat(
        F.lit('<!doctype html>\n<html><head><meta charset="utf-8"><title>synth</title>\n'
              "<style type=\"text/css\">p.af1{margin:0cm}span.af{color:#C00000;font-weight:bold}"
              "span.a1{font-style:italic}span.aff0{font-weight:bold}</style></head><body>\n"),
        F.concat_ws("", F.array_repeat(entry_block, paragraphs)),
        F.lit("</body></html>\n"),
    )
    return docs.select(
        F.concat(
            F.lit("https://synth.example/"),
            F.col("lang"),
            F.lit("/"),
            F.col("doc_id").cast("string"),
            F.lit("-"),
            F.col("copy").cast("string"),
            F.lit(".html"),
        ).alias("url"),
        F.timestamp_seconds(
            F.lit(WARC_EPOCH) + F.col("doc_id") + F.col("copy")
        ).alias("warc_ts"),
        F.encode(body, "UTF-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )


def pages_df(
    spark: SparkSession, sf_dir: str, include_fixtures: bool = True, copies: int = 1
) -> DataFrame:
    synth = synthetic_pages_df(spark, sf_dir, copies=copies)
    if include_fixtures:
        return fixture_pages_df(spark).unionByName(synth)
    return synth
