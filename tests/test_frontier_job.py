"""Frontier job: bloom-prefiltered newness + change-rate recrawl + 
blocklist politeness, end to end in-process."""

import datetime
import json
import os


def test_frontier_job_end_to_end(spark, tmp_path):
    from jobs.frontier_job import main

    t0 = datetime.datetime(2026, 1, 1, 0, 0, 0)
    day = datetime.timedelta(days=1)
    rows = []
    # u-change: churns every capture -> min-interval estimate -> overdue
    # u-stable: never changes -> clamps long -> not due yet
    for i in range(4):
        rows.append(("https://a.com/u-change", t0 + i * day, f"body v{i}".encode()))
        rows.append(("https://a.com/u-stable", t0 + i * day, b"same body"))
    captures = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, body binary"
    )
    cap_dir = str(tmp_path / "captures")
    captures.write.parquet(cap_dir)

    cands = spark.createDataFrame(
        [
            ("https://a.com/u-change",),        # known
            ("https://a.com/brand-new",),       # new
            ("https://blocked.example/x",),     # new but blocklisted
        ],
        ["url"],
    )
    cand_dir = str(tmp_path / "cands")
    cands.write.parquet(cand_dir)

    out_dir = str(tmp_path / "out")
    # u-change: 3 changes over a 3-day span -> est 86400 s -> due at t0+4d.
    # u-stable: 0 changes -> est = full span (259200 s) -> due at t0+6d.
    # asof t0+5d sits between: the churner is overdue, the stable page not.
    asof = int((t0 + 5 * day).timestamp())
    counts = main([
        "--captures", cap_dir, "--candidates", cand_dir,
        "--asof", str(asof), "--output", out_dir,
        "--blocklist", "blocked.example",
        "--bloom-bits", "16384",
    ])

    fetch = {
        r["url"]: r
        for r in spark.read.parquet(os.path.join(out_dir, "fetch")).collect()
    }
    assert counts["seen"] == 2 and counts["candidates"] == 3
    assert counts["new"] == 2          # brand-new + blocked (pre-blocklist)
    assert fetch["https://a.com/brand-new"]["reason"] == "new"
    assert "https://blocked.example/x" not in fetch            # blocklisted
    assert fetch["https://a.com/u-change"]["reason"] == "due"  # overdue churner
    assert fetch["https://a.com/u-change"]["overdue_sec"] >= 0
    assert "https://a.com/u-stable" not in fetch               # not due yet
    # bloom contract: the known candidate never classifies as new
    assert fetch["https://a.com/u-change"]["crawl_delay_sec"] == 0
