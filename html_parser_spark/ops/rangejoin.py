"""Range (interval) join — the second custom operator the brief names.

``range_join(left, right, ...)``: pair every left row (a point ``t``) with
every right row whose interval ``[lo, hi]`` contains it, sharing an equality
key.  Spark's native planner turns a pure inequality join into
BroadcastNestedLoop/cartesian; the scale path here is BUCKETIZATION:

  1. explode each right interval into the coarse time buckets it covers
     (``sequence(floor(lo/w), floor(hi/w))`` — JVM-side, no UDF);
  2. equi-join on (key, bucket) — a plain hash join, shuffle on uniform keys;
  3. re-filter exactly ``lo <= t <= hi``.

Cost: O(|right| × avg_buckets_per_interval + matches) instead of
O(|left| × |right|) per key.  Pick ``bucket_width`` ≈ median interval length
so intervals explode to ~1-2 buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int,
) -> DataFrame:
    """Times are numeric (cast timestamps to epoch seconds first).  Returns
    all left columns + all right columns (inner semantics)."""
    lb = (F.col(left_time) / bucket_width).cast("long").alias("_bucket")
    l = left.withColumn("_bucket", lb)
    r = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.col(right_lo) / bucket_width).cast("long"),
                (F.col(right_hi) / bucket_width).cast("long"),
            )
        ),
    )
    joined = l.join(r, on=[on, "_bucket"], how="inner").filter(
        (F.col(left_time) >= F.col(right_lo)) & (F.col(left_time) <= F.col(right_hi))
    )
    return joined.drop("_bucket")
