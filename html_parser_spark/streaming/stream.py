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
  ``applyInPandasWithState``: per-user EVENT-TIME sessionization (30-min
  gap, EventTimeTimeout), replay-equivalent to the batch twin
  ``q_sessionize`` — the same events produce the same sessions whether
  they arrive as a stream or sit in the lake.
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


def stream_main_content(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 16,
):
    """pages parquet drops → streaming boilerplate strip → parquet sink.

    ``extract_main_content`` is a stateless per-page map (one Arrow UDF,
    no shuffle), so the streaming twin needs no watermark or state — each
    micro-batch produces exactly the rows the batch op would, and replaying
    the same files yields byte-identical main_text (asserted in
    tests/test_streaming_multimodal.py)."""
    from html_parser_spark.ops.boilerplate import extract_main_content

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    out = extract_main_content(stream).select(
        "url", "warc_ts", "lang", "main_text", "n_blocks",
        "n_content_blocks", "content_chars", "boiler_chars",
    )
    return (
        out.writeStream.format("parquet")
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
        T.StructField("session_idx", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_value", T.DoubleType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

# last_sec: event-time of the session's latest event, WHOLE SECONDS (the
# batch twin computes gaps on second-truncated epochs — the stream must
# truncate identically or a 1800.5s gap splits here and not there).
# value_dec: the running DECIMAL(18,6) sum serialized as a string so exact
# arithmetic survives state round-trips (a double in state would drift).
_SESSION_STATE = T.StructType(
    [
        T.StructField("session_idx", T.LongType()),
        T.StructField("last_sec", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_dec", T.StringType()),
    ]
)

_SESSION_GAP_S = 1800
# dormant (idx-preserving) state rows are removed this long after their
# session closed, bounding the state store on high user cardinality
_DORMANT_TTL_S = 7 * 24 * 3600


def _dec_round2(acc) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(acc).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP))


def _session_fn(key, pdfs, state: GroupState):
    """Event-time sessionization, replay-equivalent to the batch twin
    (``__spark_entry__.q_sessionize``) for IN-ORDER delivery: per user,
    events ordered by (ts, event_id); a gap > 1800s (whole-second epochs)
    closes the session.  Values accumulate through DECIMAL(18,6) with
    HALF_UP rounding — the batch query's exact arithmetic, so stream and
    batch agree bit-for-bit on the same events replayed in order.

    Out-of-order events WITHIN the watermark are accepted but cannot be
    re-sorted into already-processed history (no incremental operator
    can); they join the current session and last_sec never regresses, so
    boundaries only ever differ from batch around genuinely late data."""
    from decimal import ROUND_HALF_UP, Decimal

    (user_id,) = key
    if state.hasTimedOut:
        idx, last_sec, n, vdec = state.get
        if n == 0:
            # dormant row hit its TTL: drop it.  Without this the state
            # store grows monotonically with user cardinality (one inert
            # row per user forever).  Trade-off: a user returning after
            # the TTL restarts session numbering — bounded state wins.
            state.remove()
            return
        # close the open session but keep a DORMANT state row (n=0): the
        # session_idx counter must survive, or the user's next session would
        # restart numbering at 1 and collide with earlier session keys.  A
        # TTL timeout schedules the dormant row's own removal (above).
        state.update((idx, last_sec, 0, "0"))
        state.setTimeoutTimestamp(
            max(
                (last_sec + _DORMANT_TTL_S) * 1000,
                state.getCurrentWatermarkMs() + 1,
            )
        )
        if n > 0:
            yield pd.DataFrame(
                [{"user_id": user_id, "session_idx": idx, "n_events": n,
                  "session_value": _dec_round2(vdec), "closed": True}]
            )
        return
    if state.exists:
        idx, last_sec, n, vdec = state.get
        acc = Decimal(vdec)
    else:
        idx, last_sec, n, acc = 0, None, 0, Decimal(0)
    out = []
    parts = [p for p in pdfs if len(p)]
    if parts:
        ev = pd.concat(parts).sort_values(["ts", "event_id"])
        q6 = Decimal("0.000001")
        for ts, val in zip(ev["ts"], ev["value"]):
            sec = pd.Timestamp(ts).value // 1_000_000_000
            if last_sec is None or sec - last_sec > _SESSION_GAP_S:
                if n > 0:  # n == 0 → dormant resume: already closed by timeout
                    out.append((idx, n, _dec_round2(acc), True))
                idx += 1
                n, acc = 0, Decimal(0)
            n += 1
            # repr() == shortest round-trip == the JVM's Double.toString,
            # which is what Spark's double→decimal cast parses
            acc += Decimal(repr(float(val))).quantize(q6, rounding=ROUND_HALF_UP)
            # never let the horizon REGRESS: a legitimately-late event
            # (within watermark, earlier ts than state) must not pull
            # last_sec backwards or the next gap check over-splits
            last_sec = sec if last_sec is None else max(last_sec, sec)
    if last_sec is not None and n > 0:
        state.update((idx, int(last_sec), n, str(acc)))
        # close when the WATERMARK passes the gap horizon; never set a
        # timeout at/before the current watermark (the API rejects it)
        timeout_ms = (last_sec + _SESSION_GAP_S + 1) * 1000
        state.setTimeoutTimestamp(
            max(timeout_ms, state.getCurrentWatermarkMs() + 1)
        )
        out.append((idx, n, _dec_round2(acc), False))
    if out:
        yield pd.DataFrame(
            [{"user_id": user_id, "session_idx": i, "n_events": c,
              "session_value": v, "closed": cl} for i, c, v, cl in out]
        )


def sessionize_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator: per-user event-time sessionization with a
    30-min gap (applyInPandasWithState + EventTimeTimeout).  Emits every
    update of the open session plus a final ``closed`` row when the
    watermark passes the gap horizon; on replay the closed sessions equal
    the batch ``q_sessionize`` output exactly."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=_SESSION_OUTPUT,
            stateStructType=_SESSION_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
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


def crawl_diff_stream(
    spark: SparkSession,
    new_dir: str,
    old_snapshot,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int = 16,
):
    """Incremental crawl diff as a STREAM-STATIC join: new captures arrive
    as a file stream, the previous snapshot is a static DataFrame, and each
    micro-batch emits (url, status, old_md5, new_md5) for the arriving urls
    — status ∈ added | changed | unchanged, matching the batch
    ``ops/web.crawl_diff`` row-for-row on those urls.

    'removed' is structurally absent: a stream can observe an arriving url,
    never a missing one — compute removals batch-side once the crawl window
    closes.  Digests are computed below the join on both sides, so the
    stream-static hash join moves 32-byte md5s, not page bodies."""
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(new_dir)
    )
    new_side = stream.select(
        "url", F.md5(F.col("html")).alias("new_md5")
    )
    old_side = old_snapshot.select(
        F.col("url"), F.md5(F.col("html")).alias("old_md5")
    )
    from html_parser_spark.ops.web import diff_status

    j = new_side.join(old_side, "url", "left")
    out = j.select(
        "url", diff_status().alias("status"), "old_md5", "new_md5"
    )
    return (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .start()
    )
