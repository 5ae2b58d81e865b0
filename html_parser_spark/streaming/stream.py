"""Structured Streaming surface.

The reference is batch-only (SURVEY.md §2.6), but a Common-Crawl-scale
ingest is naturally a stream of WARC drops; these jobs are the streaming
twins of the batch pipeline, built on the same kernels:

* ``stream_extract`` — file-source ``readStream`` over a pages directory →
  the SAME fused parse UDF → parquet sink with checkpointing.  Exactly-once
  via the sink's write-ahead log; resume is free (contrast with the batch
  path's MERGE-style anti-join in ``spark/checkpoint.py``).
* ``windowed_event_stats`` — watermarked tumbling-window aggregation
  (late data dropped after the watermark; the batch twin is
  ``__spark_entry__.q_event_windows``).
* ``sessionize_stream`` — custom stateful operator via
  ``applyInPandasWithState``: per-user session accumulation with processing-
  time timeout (the batch twin is ``q_sessionize``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 16,
):
    """pages parquet drops → streaming extraction → parquet sink.
    Returns the StreamingQuery (caller awaits/stops)."""
    from html_parser_spark.spark.pipeline import extract_pages

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    results = extract_pages(stream)  # no repartition inside a stream batch
    return (
        results.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )


def windowed_event_stats(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling-window aggregation over a streaming events frame
    (``ts TIMESTAMP, event_type STRING, value DOUBLE``)."""
    agg = (
        events.withWatermark("ts", watermark)
        # group by the window STRUCT: extracting .start before the agg breaks
        # the event-time linkage and append mode rejects the plan
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    return agg.select(
        F.col("window.start").alias("window_start"), "event_type", "n_events", "sum_value"
    )


_SESSION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_value", T.DoubleType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

_SESSION_STATE = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("session_value", T.DoubleType()),
    ]
)


def _session_fn(key, pdfs, state: GroupState):
    """Accumulate per-user event counts/values; emit and clear on timeout."""
    (user_id,) = key
    if state.hasTimedOut:
        n, v = state.get
        state.remove()
        yield pd.DataFrame(
            [{"user_id": user_id, "n_events": n, "session_value": v, "closed": True}]
        )
        return
    n, v = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        v += float(pdf["value"].sum())
    state.update((n, round(v, 2)))
    state.setTimeoutDuration(30 * 60 * 1000)  # 30min processing-time gap
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "session_value": round(v, 2), "closed": False}]
    )


def sessionize_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user session accumulation with a 30-min
    processing-time timeout (applyInPandasWithState)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn,
        outputStructType=_SESSION_OUTPUT,
        stateStructType=_SESSION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def dedup_stream(
    pages: DataFrame, watermark: str = "1 hour", key: str = "url"
) -> DataFrame:
    """Streaming exact-dedup (the batch twin is ``ops/dedup``): keep the
    first arrival per key among events inside the watermark horizon.

    ``dropDuplicatesWithinWatermark`` bounds the dedup state — at crawl
    scale re-fetches of a url cluster in time, so a bounded horizon removes
    them without unbounded state; cross-horizon (historical) duplicates are
    the batch MERGE/anti-join's job (spark/checkpoint.py), and the two
    compose: stream dedups the firehose, MERGE dedups against the lake."""
    return pages.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(
        [key]
    )
