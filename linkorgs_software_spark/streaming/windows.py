"""Watermarked windowed aggregation over an event/transcript stream.

The standard late-data-tolerant streaming aggregate: tumbling event-time
windows with a watermark bounding how late an event may arrive and still
update its window. State for windows older than the watermark is evicted;
events later than that are dropped by the engine (the documented trade of
bounded state for bounded lateness). In append output mode a window emits
exactly once — when the watermark passes its end — so a parquet/Iceberg
sink receives finalized rows only.

Batch analogue (same bucketing, oracle-checked): ``tumbling_window`` in
``__spark_entry__``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_stats(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str | None = "value",
) -> DataFrame:
    """Tumbling-window counts (+ value sum when ``value_col``) per group.

    Returns (window struct, *group_cols, n[, total_value]). Works on both
    streaming and batch frames; on a stream the watermark bounds state and
    enables append-mode finalized emission.
    """
    aggs = [F.count(F.lit(1)).alias("n")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("total_value"))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), *group_cols)
        .agg(*aggs)
    )
