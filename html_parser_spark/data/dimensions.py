"""Dimension tables (FIXTURES.md §4): the broadcast-join side of the engine.

The reference ships these as in-code constants (tags.ts, alphabets.ts,
engine/index.ts); here they are ALSO materialized as DataFrames so
standardization/validation can run as real broadcast joins and the tables
can be persisted alongside the results (Iceberg dims in production).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def tags_df(spark: SparkSession) -> DataFrame:
    """197-row grammatical-abbreviation dimension (abbr → expansion)."""
    from html_parser_spark.resources import TAGS

    return spark.createDataFrame(
        [(i, k, v) for i, (k, v) in enumerate(TAGS.items())],
        "tag_order int, abbr string, expansion string",
    )


def alphabets_df(spark: SparkSession) -> DataFrame:
    """Per-language collation dimension incl. digraphs (lang, pos, letter)."""
    from html_parser_spark.engine.alphabets import ALPHABETS

    rows = [
        (lang, pos, letter)
        for lang, alphabet in ALPHABETS.items()
        for pos, letter in enumerate(alphabet)
    ]
    return spark.createDataFrame(rows, "lang string, pos int, letter string")


def example_symbols_df(spark: SparkSession) -> DataFrame:
    from html_parser_spark.resources import EXAMPLE_START_SYMBOLS

    return spark.createDataFrame(
        [(s,) for s in EXAMPLE_START_SYMBOLS], "sym string"
    )
