"""Partition-layout evidence: results written partitioned by a low-cardinality
key are partition-pruned on read — the Iceberg `day(warc_ts)`/`bucket(url)`
analog on plain parquet (SURVEY.md §4.2)."""

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from tests.conftest import TESTDATA


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    from html_parser_spark.data.pages import synthetic_pages_df
    from html_parser_spark.spark.pipeline import extract_pages

    out = str(tmp_path / "results")
    res = extract_pages(synthetic_pages_df(spark, f"{TESTDATA}/sf0.001", paragraphs=1).limit(200))
    res.write.partitionBy("lang").mode("overwrite").parquet(out)

    back = spark.read.parquet(out).filter(F.col("lang") == "en")
    rows = back.collect()
    assert rows and all(r.lang == "en" for r in rows)

    buf = io.StringIO()
    with redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    # the lang predicate must be a partition filter, not a data filter
    assert "PartitionFilters" in plan
    assert "lang" in plan.split("PartitionFilters", 1)[1].split("\n", 1)[0]


def test_column_pruning_reaches_scan(spark, tmp_path):
    from html_parser_spark.data.pages import synthetic_pages_df

    out = str(tmp_path / "pages")
    synthetic_pages_df(spark, f"{TESTDATA}/sf0.001", paragraphs=1).limit(50).write.parquet(out)
    two_cols = spark.read.parquet(out).select("url", "lang")
    buf = io.StringIO()
    with redirect_stdout(buf):
        two_cols.explain("formatted")
    plan = buf.getvalue()
    read_schema = plan.split("ReadSchema:", 1)[1].split("\n", 1)[0]
    assert "html" not in read_schema  # the heavy blob column is NOT read
    assert "url" in read_schema and "lang" in read_schema
