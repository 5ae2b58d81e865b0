"""CDXJ capture index (sources/cdx.py): sorted shards + cluster.idx +
typed read-back."""

import gzip
import os

from pyspark.sql import functions as F


def _captures(spark, n=40):
    return (
        spark.range(n)
        .select(
            F.concat(
                F.lit("https://h"), (F.col("id") % 5).cast("string"),
                F.lit(".example.org/p/"), F.col("id").cast("string"),
            ).alias("url"),
            F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 61).alias(
                "warc_ts"
            ),
            F.lit("text/html").alias("mime"),
            (F.lit(200) + (F.col("id") % 3)).cast("int").alias("status"),
            F.md5(F.col("id").cast("string")).alias("digest"),
            (F.col("id") * 17 + 100).alias("length"),
            (F.col("id") * 1000).alias("offset"),
            F.lit("part-00000.warc.gz").alias("filename"),
        )
        .repartition(4)  # deliberately unsorted input
    )


def test_cdxj_roundtrip_sorted_shards_and_cluster_idx(spark, tmp_path):
    from html_parser_spark.sources.cdx import read_cdxj, write_cdxj_files

    caps = _captures(spark)
    out = str(tmp_path / "idx")
    n_shards = write_cdxj_files(caps, out, num_shards=3)
    assert n_shards == 3

    # global order: concatenating shards in name order is fully sorted
    all_lines = []
    for name in sorted(os.listdir(out)):
        if name.startswith("cdx-"):
            with gzip.open(os.path.join(out, name), "rt") as f:
                all_lines.extend(ln.rstrip("\n") for ln in f)
    assert all_lines == sorted(all_lines)
    assert len(all_lines) == 40

    # cluster.idx: one entry per shard, first key of each, tab-separated
    with open(os.path.join(out, "cluster.idx")) as f:
        idx = [ln.rstrip("\n").split("\t") for ln in f]
    assert [name for _, name in idx] == sorted(
        n for n in os.listdir(out) if n.startswith("cdx-")
    )
    for head, name in idx:
        with gzip.open(os.path.join(out, name), "rt") as f:
            assert f.readline().startswith(head.split(" ")[0])

    # typed read-back preserves every field
    got = read_cdxj(spark, f"{out}/cdx-*.gz")
    assert got.count() == 40
    want = {
        (r["url"], r["status"], r["length"], r["offset"], r["digest"])
        for r in caps.collect()
    }
    have = {
        (r["url"], r["status"], r["length"], r["offset"], r["digest"])
        for r in got.collect()
    }
    assert have == want
    # SURT keys put every h*.example.org subdomain in one contiguous range
    assert got.filter(F.col("key").startswith("org,example,h")).count() == 40


def test_cluster_idx_prefix_lookup_prunes_shards(spark, tmp_path):
    """The driver-side binary-search step: only shards whose key range can
    contain the prefix are opened, and reading just those shards still
    yields every capture of the target host."""
    from html_parser_spark.sources.cdx import (
        cluster_idx_shards_for_prefix,
        read_cdxj,
        write_cdxj_files,
    )

    caps = _captures(spark, n=60)
    out = str(tmp_path / "idx")
    write_cdxj_files(caps, out, num_shards=5)
    prefix = "org,example,h3)"
    hits = cluster_idx_shards_for_prefix(out, prefix)
    assert 0 < len(hits) < 5  # pruned, not everything
    paths = [os.path.join(out, h) for h in hits]
    got = read_cdxj(spark, paths).filter(F.col("key").startswith(prefix))
    assert got.count() == 12  # 60 ids, id%5==3


def test_cdxj_republish_sweeps_own_outputs_only(spark, tmp_path):
    from html_parser_spark.sources.cdx import write_cdxj_files

    caps = _captures(spark, n=10)
    out = str(tmp_path / "idx")
    write_cdxj_files(caps, out, num_shards=4)
    sibling = os.path.join(out, "part-00000.warc.gz")
    with open(sibling, "wb") as f:
        f.write(b"co-located archive")
    write_cdxj_files(caps, out, num_shards=2)
    names = sorted(os.listdir(out))
    assert sum(n.startswith("cdx-") for n in names) == 2
    assert "part-00000.warc.gz" in names  # sibling survived
    assert names.count("cluster.idx") == 1


def test_extract_job_cdx_index(spark, tmp_path, capsys):
    """--cdx publishes the capture index next to the extraction: warc:
    inputs carry real record extents usable for range reads."""
    import json

    import jobs.extract_job as ej
    from html_parser_spark.data.pages import synthetic_pages_df
    from html_parser_spark.sources.cdx import read_cdxj
    from html_parser_spark.sources.warc import write_warc_files

    pages = synthetic_pages_df(spark, "/root/testdata/sf0.001", paragraphs=1).limit(20)
    crawl = str(tmp_path / "crawl")
    write_warc_files(pages.repartition(2), crawl)
    out = str(tmp_path / "results")
    cdx = str(tmp_path / "cdx")
    ej.main([
        "--pages", f"warc:{crawl}/*.warc.gz", "--output", out,
        "--partitions", "4", "--cdx", cdx, "--cdx-shards", "2",
    ])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["cdx_shards"] == 2 and stats["docs"] == 20
    idx = read_cdxj(spark, f"{cdx}/cdx-*.gz")
    rows = idx.collect()
    assert len(rows) == 20
    # real extents: offsets/lengths present, filename is the archive part
    assert all(r["offset"] is not None and r["length"] > 0 for r in rows)
    assert all(r["filename"].startswith("part-") for r in rows)
    assert os.path.exists(os.path.join(cdx, "cluster.idx"))
    # extent spot-check: range-read one record back via the WARC fetcher
    from html_parser_spark.sources.warc import fetch_warc_records

    one = idx.limit(1).select(
        F.concat(F.lit(crawl + "/"), "filename").alias("source_file"),
        F.col("offset").alias("rec_offset"),
        F.col("length").alias("rec_length"),
    )
    fetched = fetch_warc_records(one).collect()
    assert len(fetched) == 1 and fetched[0]["url"] in {r["url"] for r in rows}
