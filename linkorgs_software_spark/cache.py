"""Session-level registry for operator-internal persisted frames.

Several corpus operators persist an intermediate frame (the exploded span
index, the banded MinHash frame, the SimHash block frame) because it feeds
two or more downstream aggregates. Those persists are correct per call but
accumulate in a long-lived session; ``release_caches()`` gives notebooks
and services a one-call release.

This registry is for OPERATOR-internal frames. ``plans/pipeline.py`` keeps
its own generation-based list (each ``link_orgs`` call retires the previous
call's stages automatically) — pipeline caches must not be dropped by a
corpus-side release mid-run, and vice versa.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_OPERATOR_CACHES: list[DataFrame] = []


def register_cache(df: DataFrame) -> DataFrame:
    """Track an operator-internal persisted frame for later bulk release."""
    _OPERATOR_CACHES.append(df)
    return df


def release_caches() -> int:
    """Unpersist every tracked operator-internal frame; returns the count.

    Safe anytime: results computed from a released frame stay correct
    (Spark recomputes the lineage on the next action) — only the reuse
    speedup is given back.
    """
    n = 0
    while _OPERATOR_CACHES:
        df = _OPERATOR_CACHES.pop()
        try:
            df.unpersist(False)
            n += 1
        except Exception:
            # best-effort release: the frame may belong to a stopped session
            pass
    return n
