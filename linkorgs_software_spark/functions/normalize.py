"""Name normalization + stable record ids — pure Catalyst expressions.

Reference semantics: ``LinkOrgs/R/LinkOrgs_LinkOrgs.R:541-568`` lowercases,
collapses whitespace and strips punctuation from the match column (each step
behind a flag), and ``:530-535`` assigns each row a content-hash id of the
*name* (duplicate names share one id, so the output granularity is distinct
name pairs). Everything here is built-in ``pyspark.sql.functions`` — these
columns stay inside whole-stage codegen; no Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import LinkConfig

NORM_COL = "name_norm"
ID_COL_X = "x_id"
ID_COL_Y = "y_id"


def normalize_expr(
    col: Column | str,
    *,
    to_lower: bool = True,
    norm_space: bool = True,
    remove_punct: bool = True,
) -> Column:
    """Normalized-name expression (lower → strip punctuation → collapse ws).

    Java regex ``\\p{P}`` covers Unicode punctuation, matching the
    reference's ``[[:punct:]]``-class removal; whitespace runs collapse to a
    single space and the result is trimmed.
    """
    c = F.col(col) if isinstance(col, str) else col
    if to_lower:
        c = F.lower(c)
    if remove_punct:
        c = F.regexp_replace(c, r"\p{P}", "")
    if norm_space:
        c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


def record_id_expr(name_col: Column | str) -> Column:
    """Stable 64-bit id from the *normalized* name.

    The reference uses ``digest::digest(name)`` (a content hash of the name,
    ``LinkOrgs_LinkOrgs.R:530-535``) — duplicate names intentionally share an
    id. ``xxhash64`` keeps the id a long (cheap shuffle key); collisions at
    64 bits are negligible at any realistic name-cardinality.
    """
    c = F.col(name_col) if isinstance(name_col, str) else name_col
    return F.xxhash64(c)


def prepare_side(df: DataFrame, name_col: str, id_col: str, cfg: LinkConfig) -> DataFrame:
    """Add ``name_norm`` + content-hash id; keep all user columns.

    Mirrors reference steps 3 of the lifecycle (SURVEY.md §3.1): id &
    preprocess. Rows whose name is NULL or normalizes to '' are dropped
    (reference drops NA keys — ``test-edge-cases.R`` semantics).
    """
    out = df.withColumn(
        NORM_COL,
        normalize_expr(
            name_col,
            to_lower=cfg.to_lower,
            norm_space=cfg.norm_space,
            remove_punct=cfg.remove_punct,
        ),
    )
    out = out.filter(F.col(NORM_COL).isNotNull() & (F.length(NORM_COL) > 0))
    return out.withColumn(id_col, record_id_expr(NORM_COL))


def deconflict_names(df: DataFrame) -> DataFrame:
    """Collapse ``<col>_x`` / ``<col>_y`` twins that are value-identical.

    Reference ``DeconflictNames`` (``LinkOrgs_BuildHelpers.R:211-236``):
    after the back-merge, a column pair whose values agree on every row is
    redundant — drop the ``_y`` twin and strip the suffix; pairs that
    actually conflict keep both columns. One aggregate pass computes every
    pair's mismatch count (null-safe), so the check is a single scalar job,
    not one action per column.
    """
    pairs = []
    for c in df.columns:
        if c.endswith("_x"):
            base, other = c[:-2], c[:-2] + "_y"
            if other in df.columns and base not in df.columns:
                pairs.append((base, c, other))
    if not pairs:
        return df
    aggs = [
        F.count(F.when(~F.col(cx).eqNullSafe(F.col(cy)), F.lit(1))).alias(base)
        for base, cx, cy in pairs
    ]
    row = df.agg(*aggs).collect()[0]
    out = df
    for base, cx, cy in pairs:
        if row[base] == 0:
            out = out.drop(cy).withColumnRenamed(cx, base)
    return out


def pair_id_expr(x_id: Column | str, y_id: Column | str) -> Column:
    """Pair key — reference ``XYref__ID`` (``LinkOrgs_LinkOrgs.R:687``)."""
    cx = F.col(x_id) if isinstance(x_id, str) else x_id
    cy = F.col(y_id) if isinstance(y_id, str) else y_id
    return F.concat_ws("__LINKED__", cx.cast("string"), cy.cast("string"))
