"""As-of join — a custom operator Spark lacks natively (brief §custom
operators: compose from existing DataFrame ops when semantics allow).

``as_of_join(left, right, ...)``: for every left row, the single right row
with the greatest ``right_time <= left_time`` within the same key — the
classic point-in-time lookup (latest order before an event, latest price
before a trade).

Implementation is a composition, no UDF:

    left ⋈ right ON key AND right_time <= left_time      (range condition)
    → groupBy(left row id) . max_by(right struct, right_time)

Scale note: the equality key makes this a plain hash join (shuffle on key,
uniform); the range predicate filters post-match.  For high right-side
cardinality per key, pre-bucket right by time and join on (key, bucket) —
the IVF analog — before the range filter.  Tie-breaking on equal
right_time is deterministic via the (time, tiebreak) struct ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    tiebreak: str,
    right_values: list[str],
    how: str = "inner",
) -> DataFrame:
    """Returns left columns + the matched right's ``right_values`` columns
    (aliased as-is) + ``asof_time``.  ``how='left'`` keeps unmatched rows."""
    l = left.alias("l")
    r = right.alias("r")
    cond = (F.col(f"l.{on}") == F.col(f"r.{on}")) & (
        F.col(f"r.{right_time}") <= F.col(f"l.{left_time}")
    )
    joined = l.join(r, cond, "inner")
    # pick the latest right row per left row; ties broken by the largest
    # tiebreak column so the result is deterministic
    pick = F.max_by(
        F.struct(*[F.col(f"r.{c}").alias(c) for c in right_values]),
        F.struct(F.col(f"r.{right_time}"), F.col(f"r.{tiebreak}")),
    ).alias("_m")
    latest = joined.groupBy(*[F.col(f"l.{c}") for c in left.columns]).agg(
        pick, F.max(F.col(f"r.{right_time}")).alias("asof_time")
    )
    out = latest.select(
        *left.columns, *[F.col(f"_m.{c}").alias(c) for c in right_values], "asof_time"
    )
    if how == "left":
        return left.join(out.select(*left.columns, *right_values, "asof_time"),
                         on=left.columns, how="left")
    return out
