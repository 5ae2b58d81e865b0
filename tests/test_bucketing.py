"""Bucketing evidence: the co-located-join strategy SCALE.md claims for
100 TB joins, executed.  Two tables bucketed+sorted on the join key must
SortMergeJoin with ZERO Exchange on either side — the shuffle happened
once at write time and never again for any number of downstream joins."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # external tables via .option("path", ...): the session's warehouse dir
    # is a static conf, but bucketed external tables land anywhere
    wh = str(tmp_path_factory.mktemp("warehouse"))
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    left = docs.select("doc_id", "text")
    right = docs.select("doc_id", "lang", "n_chars")
    for name, df in [("bkt_left", left), ("bkt_right", right)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .bucketBy(8, "doc_id")
            .sortBy("doc_id")
            .option("path", f"{wh}/{name}")
            .saveAsTable(name)
        )
    yield "bkt_left", "bkt_right"
    for name in ("bkt_left", "bkt_right"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    ln, rn = bucketed_tables
    # disable broadcast so the join strategy under test is the bucketed
    # sort-merge path (at 100 TB neither side broadcasts anyway)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(ln).join(spark.table(rn), "doc_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # co-located: bucket layout reused
        assert j.count() == spark.table(ln).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_groupby_no_exchange(spark, bucketed_tables):
    ln, _ = bucketed_tables
    agg = spark.table(ln).groupBy("doc_id").agg(F.count("*").alias("c"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # aggregation on the bucket key also reuses the layout
    assert "Exchange" not in plan
    assert agg.where("c != 1").count() == 0


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    """Control: the same join without bucketing pays the Exchange —
    proving the assertion above measures bucketing, not AQE luck."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    big = docs.select("doc_id", "text")
    # force non-broadcast so the shuffle is observable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = big.join(docs.select("doc_id", "lang"), "doc_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
