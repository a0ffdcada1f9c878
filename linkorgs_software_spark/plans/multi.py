"""Multi-source entity resolution: N name tables → one entity id space.

The reference links exactly two tables per call (``LinkOrgs(x, y, ...)``,
``LinkOrgs/R/LinkOrgs_LinkOrgs.R:150-168``); resolving MANY sources with it
means hand-chaining pairwise runs and reconciling ids. ``link_many`` does
that as one plan: every source pair is blocked + scored with the same
trigram/q-gram machinery as ``link_orgs``, accepted pairs become edges,
and connected components assign one ``entity_id`` per transitively-linked
name group across ALL sources — the N-way generalization of the alias
directory's precomputed ``canonical_id``.

Scale shape: C(N,2) pairwise blocking joins (each df-capped exactly like
the 2-way path — sources are typically few, so the pair count is small
while each join is large), one union of narrow edge frames, and the
O(log diameter) pointer-jumping components. Node keys are
``"<side:02d>:<name_norm>"`` strings, so the component label (min node
key) is deterministic and ANSI-SQL-portable; singleton names (no accepted
edge) keep their own key as ``entity_id``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import LinkConfig
from ..functions.normalize import NORM_COL, prepare_side
from ..operators.blocking import candidate_pairs
from ..operators.cluster import connected_components
from ..operators.scoring import DIST_COL, score_pairs


def _node_key(side: int, norm_col) -> F.Column:
    return F.concat(F.lit(f"{side:02d}:"), norm_col)


def link_many(
    sides: Sequence[DataFrame],
    cfg: LinkConfig,
    *,
    by: str | Sequence[str] = "name",
    max_dist: float = 0.5,
    return_edges: bool = False,
) -> DataFrame:
    """Resolve entities across ``sides``: returns one row per distinct
    normalized name per source — ``(side, name, name_norm, entity_id)``,
    where ``name`` is the representative (minimum) original spelling of
    the normalized group and ``entity_id`` is shared by every name in the
    same transitive match component across all sources.

    ``by`` is the name column (one string for all sides, or one per
    side). Matching is the fuzzy path at the pinned ``max_dist`` (pairs
    are edges, so no one-to-one pruning — clustering replaces it).

    ``return_edges=True`` returns the ACCEPTED-EDGE frame instead —
    ``(side_x, side_y, name_norm_x, name_norm_y, stringdist, src, dst)``,
    one row per accepted cross-source pair with the side indices and the
    component node keys — so an N-way merge is auditable the same way
    2-way matches are: feed the (name_norm_x, name_norm_y) pairs to
    ``operators.scoring.explain_pairs`` for the full per-pair evidence
    panel, or join ``src``/``dst`` back to the resolved frame's
    ``entity_id`` to see which edges built a suspicious mega-entity.
    """
    if len(sides) < 2:
        raise ValueError("link_many needs at least two sources")
    by_cols = [by] * len(sides) if isinstance(by, str) else list(by)
    if len(by_cols) != len(sides):
        raise ValueError("one `by` column per side (or a single string)")

    prepared = []
    nodes = None
    for i, (df, col) in enumerate(zip(sides, by_cols)):
        p = prepare_side(df.select(F.col(col).alias("name")), "name", f"m{i}", cfg)
        prepared.append(p)
        n = (
            p.groupBy(F.col(NORM_COL).alias("name_norm"))
            .agg(F.min("name").alias("name"))
            .select(
                F.lit(i).alias("side"),
                "name",
                "name_norm",
                _node_key(i, F.col("name_norm")).alias("_node"),
            )
        )
        nodes = n if nodes is None else nodes.unionByName(n)

    edges = None
    for i in range(len(sides)):
        for j in range(i + 1, len(sides)):
            pairs = candidate_pairs(
                prepared[i], prepared[j], cfg, x_id=f"m{i}", y_id=f"m{j}"
            )
            scored = score_pairs(
                pairs,
                prepared[i],
                prepared[j],
                cfg,
                x_id=f"m{i}",
                y_id=f"m{j}",
                max_dist=max_dist,
            )
            e = scored.select(
                F.lit(i).cast("int").alias("side_x"),
                F.lit(j).cast("int").alias("side_y"),
                "name_norm_x",
                "name_norm_y",
                DIST_COL,
                _node_key(i, F.col("name_norm_x")).alias("src"),
                _node_key(j, F.col("name_norm_y")).alias("dst"),
            ).dropDuplicates(["src", "dst"])
            edges = e if edges is None else edges.unionByName(e)

    if return_edges:
        return edges

    comp = connected_components(
        edges.select("src", "dst"), src="src", dst="dst"
    )
    return (
        nodes.join(comp.withColumnRenamed("id", "_node"), "_node", "left")
        .select(
            "side",
            "name",
            "name_norm",
            # singletons (no accepted edge) are their own entity
            F.coalesce("component", F.col("_node")).alias("entity_id"),
        )
    )
