"""Keep-best-per-group dedup with a *total* order.

The reference dedups twice: keep the closest directory hit per
``(name, canonical_id)`` (``LinkOrgs/R/LinkOrgs_LinkOrgs.R:625-632``) and
keep one row per pair id after ``minDist`` (``:737-754``). Both rely on
first-encountered row order — nondeterministic under Spark parallelism
(SURVEY.md §7.4 risk 2) — so we impose an explicit total order:
distance, then the tiebreaker columns, via ``row_number() == 1``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def keep_min_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    dist_col: str,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """One row per group: smallest ``dist_col``, ties broken totally."""
    order = [F.col(dist_col).asc_nulls_last()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def keep_top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    dist_col: str,
    k: int,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Top-k closest rows per group (the per-key-k extension of the
    reference's global-quantile budget — SURVEY.md §2.6)."""
    order = [F.col(dist_col).asc_nulls_last()] + [F.col(c).asc() for c in tiebreak_cols]
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def min_over_group(df: DataFrame, group_cols: Sequence[str], dist_col: str, out_col: str) -> DataFrame:
    """Attach the per-group minimum as a column (reference ``tapply`` min,
    ``LinkOrgs_LinkOrgs.R:737-740``) without dropping rows."""
    w = Window.partitionBy(*[F.col(c) for c in group_cols])
    return df.withColumn(out_col, F.min(dist_col).over(w))
