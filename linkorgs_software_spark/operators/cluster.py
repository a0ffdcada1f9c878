"""Transitive clustering: connected components over accepted match edges.

The reference never computes clusters itself — its alias directory ships a
precomputed ``canonical_id`` per alias (``LinkOrgs/R/LinkOrgs_LinkOrgs.R:
460-477``), which *is* an entity-cluster id. A from-scratch engine must
reproduce that step: connected components over the match-edge graph
(SURVEY.md §3.2 step 5 note), emitting ``cluster_id`` per record.

Implementation: iterative **min-label propagation with pointer jumping** —
each round every node adopts the minimum label among itself and its
neighbors (one hop), then shortcuts to its label's label (path halving, the
"hash-to-min + shortcut" scheme of the large-star/small-star family,
Kiveris et al. 2014). One-hop propagation alone converges in O(diameter)
rounds — fine for star-shaped ER graphs, but a long chain pays one
driver-synchronized job per hop; the shortcut join makes label distance
roughly double per round, so convergence is O(log diameter) for any shape.
Lineage is cut with an eager ``localCheckpoint`` per round; the convergence
``count()`` runs only every ``check_every`` rounds (extra rounds past the
fixpoint are no-ops, so correctness is unaffected). The per-round shuffles
hash-partition by *node*, so a mega-component does not skew a single task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    check_every: int = 2,
) -> DataFrame:
    """Components of an undirected graph → ``(id, component)``.

    ``component`` is the minimum node id in the component (stable,
    deterministic). Isolated nodes appear iff present as self or one-sided
    edges; callers union in singleton records themselves.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    # materialize the symmetric edge list ONCE: every iteration's neighbor
    # join re-reads it, and without the checkpoint each round re-executes
    # the caller's full edge lineage (for link_many that is every pairwise
    # blocking+scoring join — measured round 7: ~3s per CC round, half the
    # query's wall time, all recomputation)
    sym = sym.localCheckpoint(eager=True)
    nodes = sym.select(F.col("a").alias("id")).distinct()

    labels = nodes.withColumn("component", F.col("id"))
    labels = labels.localCheckpoint(eager=True)

    for it in range(max_iter):
        # one hop: every node adopts the min label over itself + neighbors
        nbr = (
            sym.join(labels.withColumnRenamed("id", "a"), "a")
            .select(F.col("b").alias("id"), F.col("component"))
        )
        hop = (
            labels.select("id", "component")
            .union(nbr)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        # pointer jumping (path halving): component := label(component).
        # Every label value is itself a node id, and a node's label is <=
        # its id, so the shortcut only ever decreases labels — label
        # distance to the component minimum roughly halves per round.
        lab2 = hop.select(
            F.col("id").alias("_cid"), F.col("component").alias("_c2")
        )
        new_labels = (
            hop.join(lab2, hop["component"] == lab2["_cid"])
            .select("id", F.col("_c2").alias("component"))
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        if (it + 1) % check_every == 0 or it == max_iter - 1:
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "id")
                .filter(F.col("n.component") != F.col("o.component"))
                .count()
            )
            if changed == 0:
                return new_labels
        labels = new_labels
    return labels


def edges_from_matches(matches: DataFrame, x_id: str = "x_id", y_id: str = "y_id") -> DataFrame:
    """Match pairs → edge list over a shared id space.

    The two sides use independent 64-bit name hashes; collisions across
    sides are what the pair itself asserts (an x-node and y-node may hash
    equal only if the normalized names are equal — which is a true edge
    anyway), so ids can share one space directly.
    """
    return matches.select(F.col(x_id).alias("src"), F.col(y_id).alias("dst"))


def clusters_to_pairs(
    assign: DataFrame,
    *,
    id_col: str = "id",
    comp_col: str = "component",
    max_cluster_size: int | None = None,
) -> DataFrame:
    """Expand a cluster assignment into all intra-cluster pairs (id_a < id_b).

    Used by the evaluation harness to compare transitive clusters against
    labeled pairs at pair granularity. The self-join squares per component,
    so a mega-entity (skew risk, SURVEY.md §7.4) is guarded by
    ``max_cluster_size``: components above the cap are dropped from pair
    expansion (at 10^12-turn scale a squared mega-cluster is never a useful
    artifact — it is a blocking/threshold bug surfaced as data).
    """
    a = assign.select(F.col(comp_col).alias("c"), F.col(id_col).alias("id_a"))
    if max_cluster_size is not None:
        sizes = assign.groupBy(F.col(comp_col).alias("c")).agg(
            F.count(F.lit(1)).alias("_sz")
        )
        keep = sizes.filter(F.col("_sz") <= max_cluster_size).select("c")
        a = a.join(keep, "c", "left_semi")
    b = a.select(F.col("c"), F.col("id_a").alias("id_b"))
    return a.join(b, "c").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b", "c")


def canonicalize_clusters(
    records: DataFrame,
    *,
    cluster_col: str = "component",
    name_col: str = "name",
) -> DataFrame:
    """Survivorship: elect one canonical (golden-record) name per entity
    cluster — the step after ``connected_components`` that turns a
    resolved partition into a publishable entity table, mirroring what
    the reference's alias directory ships precomputed (one canonical
    string per ``canonical_id``, ``LinkOrgs/R/LinkOrgs_LinkOrgs.R:
    460-477``): this operator is how such a directory gets BUILT.

    Election rule (deterministic): most frequent name value in the
    cluster; ties break to the SHORTEST name, then lexicographically —
    frequency is the survivorship signal ("the form most records agree
    on"), shortness prefers the base form over decorated variants
    ("acme" over "acme corp ltd") among equally-common ones.

    One row per cluster: ``(component, canonical_name, canonical_count,
    n_members, n_distinct_names, canonical_share)``. NULL names do not
    vote and are not counted (a record with no surviving name field
    cannot contribute a form).

    Scale shape: one count aggregate per (cluster, name) — map-side
    combined, so a 10M-member entity with 3 spellings reduces to 3 rows
    before the shuffle — then a per-cluster window over the DISTINCT-NAME
    frame (bounded by name variety, not membership) picks the winner.
    No self-joins, no member materialization; skew-safe for viral
    entities by construction.
    """
    from pyspark.sql import Window

    counts = (
        records.filter(F.col(name_col).isNotNull())
        .groupBy(F.col(cluster_col).alias("component"), F.col(name_col).alias("_nm"))
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    w = Window.partitionBy("component").orderBy(
        F.col("_cnt").desc(), F.length("_nm").asc(), F.col("_nm").asc()
    )
    totals = counts.groupBy("component").agg(
        F.sum("_cnt").alias("n_members"),
        F.count(F.lit(1)).alias("n_distinct_names"),
    )
    winners = (
        counts.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("component", F.col("_nm").alias("canonical_name"), F.col("_cnt").alias("canonical_count"))
    )
    return winners.join(totals, "component").select(
        "component",
        "canonical_name",
        F.col("canonical_count").cast("long").alias("canonical_count"),
        F.col("n_members").cast("long").alias("n_members"),
        F.col("n_distinct_names").cast("long").alias("n_distinct_names"),
        F.round(F.col("canonical_count") / F.col("n_members"), 6).alias(
            "canonical_share"
        ),
    )


GOLDEN_STRATEGIES = ("majority", "min", "max", "longest")


def golden_record(
    records: DataFrame,
    fields: dict[str, str],
    *,
    cluster_col: str = "component",
) -> DataFrame:
    """Multi-field survivorship: elect one published value PER FIELD per
    entity cluster — the generalization of ``canonicalize_clusters``
    (which elects only a name) to the full golden record an MDM-style
    consumer publishes after resolution.

    ``fields`` maps column → strategy:

    * ``"majority"`` — most frequent non-null value; ties break to the
      minimum value (deterministic under any partitioning).
    * ``"min"`` / ``"max"`` — plain extrema (native null-ignoring
      aggregates; the right call for "earliest ts" / "highest balance").
    * ``"longest"`` — longest value, ties to the minimum (the
      most-qualified surface form; strings only).

    NULLs never vote under any strategy; a cluster whose field is
    all-NULL publishes NULL for it. Output: one row per cluster —
    ``(component, n_members, <field...>)`` with the fields' original
    names and types.

    Scale shape: ONE base aggregate carries ``n_members`` and every
    min/max/longest field (map-side combined), plus one (cluster, value)
    count aggregate + distinct-value window per MAJORITY field — each
    bounded by value variety, never membership, so a viral entity costs
    rows proportional to its distinct values. No member materialization,
    no self-joins; the per-majority-field aggregates are schema-bounded
    (len(fields)), not data-bounded.
    """
    bad = {c: s for c, s in fields.items() if s not in GOLDEN_STRATEGIES}
    if bad:
        raise ValueError(
            f"unknown golden_record strategies {bad}; choose from {GOLDEN_STRATEGIES}"
        )
    if cluster_col in fields:
        raise ValueError("cluster_col cannot also be an elected field")
    from pyspark.sql import Window

    comp = F.col(cluster_col).alias("component")
    base_aggs = [F.count(F.lit(1)).cast("long").alias("n_members")]
    for col, strat in fields.items():
        if strat == "min":
            base_aggs.append(F.min(col).alias(col))
        elif strat == "max":
            base_aggs.append(F.max(col).alias(col))
        elif strat == "longest":
            # null-free ordering key: non-null beats null (flag), then
            # longest, then minimum value — a null value must never win
            # min_by just because its struct fields compare low
            base_aggs.append(
                F.min_by(
                    col,
                    F.struct(
                        F.col(col).isNull().cast("int"),
                        F.coalesce(-F.length(col), F.lit(0)),
                        F.coalesce(F.col(col).cast("string"), F.lit("")),
                    ),
                ).alias(col)
            )
    out = records.groupBy(comp).agg(*base_aggs)
    for col, strat in fields.items():
        if strat != "majority":
            continue
        counts = (
            records.filter(F.col(col).isNotNull())
            .groupBy(comp, F.col(col).alias("_v"))
            .agg(F.count(F.lit(1)).alias("_cnt"))
        )
        w = Window.partitionBy("component").orderBy(
            F.col("_cnt").desc(), F.col("_v").asc()
        )
        winner = (
            counts.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select("component", F.col("_v").alias(col))
        )
        out = out.join(winner, "component", "left")
    return out.select(
        "component", "n_members", *[F.col(c) for c in fields]
    )
