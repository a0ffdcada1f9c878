"""Transcripts → entity linkage — the driver ``input_hint`` path.

Input: a table of multi-turn conversation/agent transcripts
``(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp)`` (Iceberg at scale; parquet in the sandbox). This plan:

1. extracts org-name mentions from turn text (pure Catalyst regex —
   the transcripts frame itself is never mutated: per-turn text equality
   under stable ``turn_idx`` ordering is the driver invariant),
2. links the distinct mention names against a reference name table with
   the standard pipeline (same blocking key),
3. re-attaches conversation provenance (conv_id, turn_idx) to each match.

At 10^12-turn scale the mention extraction is a single narrow map over the
transcripts scan (predicate/column pruning reach the Iceberg scan); only
the (much smaller) distinct-mention table enters the blocking shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT, LinkConfig
from ..functions.normalize import normalize_expr
from .pipeline import link_orgs

MENTION_PATTERN = r"\[\[(.*?)\]\]"


def extract_mentions(
    transcripts: DataFrame, pattern: str = MENTION_PATTERN
) -> DataFrame:
    """``(conv_id, turn_idx, name)`` — one row per mention occurrence."""
    return transcripts.select(
        "conv_id",
        "turn_idx",
        F.explode(F.regexp_extract_all(F.col("text"), F.lit(pattern), 1)).alias("name"),
    )


def link_transcript_mentions(
    transcripts: DataFrame,
    reference_names: DataFrame,
    cfg: LinkConfig = DEFAULT,
    *,
    pattern: str = MENTION_PATTERN,
    algorithm: str = "fuzzy",
    directory: DataFrame | None = None,
    one_to_one: bool = True,
) -> DataFrame:
    """Link transcript mentions to ``reference_names`` (column ``cfg.by_y``).

    Returns matched pairs with provenance: ``(conv_id, turn_idx, name_x,
    name_y, stringdist, minDist, ...)`` — one row per (mention occurrence,
    matched reference name).
    """
    mentions = extract_mentions(transcripts, pattern)
    mention_names = mentions.select(F.col("name").alias(cfg.by_x)).distinct()
    z = link_orgs(
        mention_names,
        reference_names,
        cfg,
        algorithm=algorithm,
        directory=directory,
        one_to_one=one_to_one,
        return_diagnostics=True,  # name_norm_x carries the provenance key
    )
    # Provenance re-join on the NORMALIZED mention: link_orgs collapses
    # normalization-equal raw variants (case/punctuation differences) into
    # one x_id with a single representative name_x, so a raw-equality join
    # would silently drop every non-representative variant's occurrences.
    m = mentions.withColumn("_mention_norm", normalize_expr("name"))
    out = m.join(z, m["_mention_norm"] == z["name_norm_x"]).drop(
        m["name"]
    ).drop("_mention_norm")
    # hide the diagnostics again — callers get provenance + reference output
    drop_diag = [c for c in ("x_id", "y_id", "pair_id", "name_norm_x",
                             "name_norm_y", "netdist_x", "netdist_y",
                             "canonical_id") if c in out.columns]
    return out.drop(*drop_diag)
