"""Checkpoint/resume + per-partition lineage (north_rule: "resumable from
checkpoint with per-partition lineage + metrics").

Production design (documented, SURVEY.md §4.2): the results table is Iceberg
and resume is ``MERGE INTO results ... WHEN NOT MATCHED INSERT`` keyed on
url — idempotent, transactional, partition-prunable.  This sandbox has no
Iceberg runtime jar, so the same semantics are implemented on plain parquet:

* the results dir is an append-only set of ``chunk=<n>`` subdirs (each an
  atomic parquet write);
* resume anti-joins the source against already-written urls (the MERGE
  NOT-MATCHED condition) before running the parse — a killed run re-does at
  most the in-flight chunk;
* every chunk also appends a ``_lineage`` row set: (chunk, partition_id,
  url_count, byte_count, error_count) captured DISTRIBUTED via
  ``spark_partition_id()`` — no driver-side counting.

The anti-join is broadcast when the done-set is small, shuffle otherwise —
left to AQE; urls are unique so there is no skew.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


class CheckpointedExtraction:
    def __init__(self, spark: SparkSession, results_dir: str):
        self.spark = spark
        self.results_dir = results_dir
        self.data_dir = os.path.join(results_dir, "data")
        self.lineage_dir = os.path.join(results_dir, "_lineage")

    # -- state -------------------------------------------------------------
    def done_urls(self) -> DataFrame | None:
        if not os.path.isdir(self.data_dir):
            return None
        try:
            return self.spark.read.parquet(self.data_dir).select("url")
        except Exception:
            return None

    def _next_chunk(self) -> int:
        if not os.path.isdir(self.data_dir):
            return 0
        chunks = [
            int(d.split("=", 1)[1])
            for d in os.listdir(self.data_dir)
            if d.startswith("chunk=")
        ]
        return max(chunks) + 1 if chunks else 0

    # -- the resumable run --------------------------------------------------
    def run(
        self,
        pages: DataFrame,
        num_partitions: int = 64,
        max_html_bytes: int | None = None,
    ) -> dict:
        """Parse every page not yet in the results table; returns metrics.
        Idempotent: re-running after a kill completes the remainder."""
        from html_parser_spark.spark.pipeline import extract_pages

        done = self.done_urls()
        todo = pages
        if done is not None:
            todo = pages.join(done, on="url", how="left_anti")
        results = extract_pages(
            todo, num_partitions=num_partitions, max_html_bytes=max_html_bytes
        )
        chunk = self._next_chunk()
        out = results.withColumn("part_id", F.spark_partition_id())
        chunk_path = os.path.join(self.data_dir, f"chunk={chunk}")
        out.write.mode("overwrite").parquet(chunk_path)

        written = self.spark.read.parquet(chunk_path)
        lineage = written.groupBy("part_id").agg(
            F.lit(chunk).alias("chunk"),
            F.count("*").alias("url_count"),
            F.sum("n_bytes_in").alias("byte_count"),
            F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias("error_count"),
        )
        lineage.write.mode("append").parquet(self.lineage_dir)
        row = written.agg(
            F.count("*").alias("docs"), F.sum("n_entries").alias("entries")
        ).collect()[0]
        return {"chunk": chunk, "docs": row["docs"], "entries": row["entries"] or 0}

    def results(self) -> DataFrame:
        return self.spark.read.parquet(self.data_dir)

    def lineage(self) -> DataFrame:
        return self.spark.read.parquet(self.lineage_dir)
