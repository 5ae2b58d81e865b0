"""The flagship extraction pipeline: pages table → results table.

Physical plan (SURVEY.md §4.3):

    Scan(pages, prune=[url, warc_ts, html, lang])
    → Exchange (salted repartition by xxhash64(url) % P)   # skew defeat
    → ArrowEvalPython [parse_document kernel]              # ONE fused UDF stage
    → Project [url, warc_ts, lang, fmt, extracted_text, entries, n_entries, ...]
    → sink (parquet here; Iceberg MERGE INTO in production)

Everything per-document → the parse is a pure partition-parallel map; the
only exchange is the explicit salting one.  The UDF is a single pandas UDF
returning a struct column (Arrow-batched, no per-row Python at the Spark
API level), honoring BASELINE.json input_hint.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

ENTRY_TYPE = T.StructType(
    [
        T.StructField("spelling", T.StringType()),
        T.StructField("inflection", T.StringType()),
        T.StructField("definitions", T.ArrayType(T.StringType())),
    ]
)

PARSED_TYPE = T.StructType(
    [
        T.StructField("fmt", T.StringType()),
        T.StructField("extracted_text", T.StringType()),
        T.StructField("entries", T.ArrayType(ENTRY_TYPE)),
        T.StructField("n_entries", T.IntegerType()),
        T.StructField("error", T.StringType()),
    ]
)


@F.pandas_udf(PARSED_TYPE)
def parse_html_udf(html: pd.Series) -> pd.DataFrame:
    # import inside the UDF so executors resolve the package from --py-files
    from html_parser_spark.kernel import parse_document

    # column-wise assembly (no per-row dict scan in pd.DataFrame inference)
    fmts, texts, entries, n_entries, errors = [], [], [], [], []
    for b in html:
        r = parse_document(b if b is not None else b"")
        fmts.append(r["fmt"])
        texts.append(r["extracted_text"])
        entries.append(r["entries"])
        n_entries.append(r["n_entries"])
        errors.append(r["error"])
    return pd.DataFrame(
        {
            "fmt": fmts,
            "extracted_text": texts,
            "entries": entries,
            "n_entries": n_entries,
            "error": errors,
        },
        copy=False,
    )


def salted_repartition(df: DataFrame, num_partitions: int) -> DataFrame:
    """Explicit skew defeat: hash-repartition on the url itself — a
    high-cardinality deterministic key — spreads hot domains and pathological
    input orderings uniformly (SURVEY.md §4.2).

    NB: do NOT pre-reduce the hash to a small salt range
    (``pmod(xxhash64(url), N)``): Spark re-hashes the partitioning
    expression, so N distinct salt values thrown into N buckets leave ~1/e of
    the partitions empty (balls-in-bins) — measured in tests/test_skew.py.
    Partitioning on the raw key keeps full cardinality and is resume-stable."""
    return df.repartition(num_partitions, F.col("url"))


def extract_pages(
    pages: DataFrame,
    num_partitions: int | None = None,
    max_html_bytes: int | None = None,
) -> DataFrame:
    """pages(url, warc_ts, html, text, lang) → results table (one row per url).

    ``max_html_bytes`` (operational guard for crawl-scale inputs): documents
    over the cap are NOT parsed — they come back as fmt='oversized' with an
    error note instead of stalling a task on a pathological page.  Off by
    default so test/golden semantics are exact."""
    # project early so the scan prunes to exactly the columns we read
    src = pages.select("url", "warc_ts", "html", "lang")
    if num_partitions:
        src = salted_repartition(src, num_partitions)
    if max_html_bytes:
        # filter+union, NOT when(): a conditional around a Python UDF still
        # evaluates the UDF for every row in the Arrow batch
        small = extract_pages(src.filter(F.length("html") <= max_html_bytes))
        big = src.filter(F.length("html") > max_html_bytes).select(
            "url",
            "warc_ts",
            "lang",
            F.lit("oversized").alias("fmt"),
            F.lit(None).cast("string").alias("extracted_text"),
            F.array()
            .cast("array<struct<spelling:string,inflection:string,definitions:array<string>>>")
            .alias("entries"),
            F.lit(0).alias("n_entries"),
            F.length("html").alias("n_bytes_in"),
            F.concat(
                F.lit("oversized: "), F.length("html").cast("string"), F.lit(" bytes")
            ).alias("error"),
        )
        return small.unionByName(big)
    parsed = src.withColumn("parsed", parse_html_udf(F.col("html")))
    return parsed.select(
        "url",
        "warc_ts",
        "lang",
        F.col("parsed.fmt").alias("fmt"),
        F.col("parsed.extracted_text").alias("extracted_text"),
        F.col("parsed.entries").alias("entries"),
        F.col("parsed.n_entries").alias("n_entries"),
        F.length("html").alias("n_bytes_in"),
        F.col("parsed.error").alias("error"),
    )


def quality_metrics(results: DataFrame) -> DataFrame:
    """Aggregate job metrics (the reference's console counters, M15-style)."""
    return results.agg(
        F.count("*").alias("docs"),
        F.sum("n_entries").alias("entries"),
        F.sum("n_bytes_in").alias("bytes_in"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("errors"),
        F.sum(F.length("extracted_text")).alias("text_chars"),
    )
