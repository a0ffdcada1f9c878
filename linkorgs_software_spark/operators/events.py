"""Event-stream batch operators: sessionization + JSON property access.

Not present in the reference (strictly batch org-linkage), but required by
the transcripts/events side of a training-data pipeline: conversations and
event streams sessionize the same way (gap-based session ids over a
per-key time order). Pure window expressions — one shuffle on the
partition key; at 10^12 rows the input should already be bucketed or
range-partitioned by ``key_col`` so the window sort is partition-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _epoch(c):
    """Epoch seconds (double) — handles TIMESTAMP and TIMESTAMP_NTZ (the
    latter cannot cast straight to double in Spark 4)."""
    return c.cast("timestamp").cast("double")


def sessionize(
    events: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    order_cols: tuple = (),
) -> DataFrame:
    """Assign gap-based session ids per key.

    A new session starts when the time since the previous event of the same
    key exceeds ``gap_minutes``. ``session_seq`` is the 1-based session
    index per key; ``session_id`` is globally unique (key + seq).
    """
    order = [F.col(ts_col)] + [F.col(c) for c in order_cols]
    w = Window.partitionBy(key_col).orderBy(*order)
    gap_s = gap_minutes * 60.0
    prev_ts = F.lag(ts_col).over(w)
    new_session = (
        prev_ts.isNull()
        | ((_epoch(F.col(ts_col)) - _epoch(prev_ts)) > gap_s)
    ).cast("int")
    out = events.withColumn(
        "session_seq",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return out.withColumn(
        "session_id",
        F.concat_ws("#", F.col(key_col).cast("string"), F.col("session_seq").cast("string")),
    )


def session_stats(sessions: DataFrame, *, key_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Per-session aggregates: event count, span seconds, total value."""
    return sessions.groupBy(key_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (_epoch(F.max(F.col(ts_col))) - _epoch(F.min(F.col(ts_col)))).alias(
            "span_seconds"
        ),
        F.sum("value").alias("total_value"),
    )


def json_prop_expr(col, key: str):
    """Extract a scalar property from a JSON string column (native)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, f"$.{key}")
