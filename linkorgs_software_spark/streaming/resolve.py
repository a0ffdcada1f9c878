"""Incremental entity resolution against an EVOLVING alias directory.

``incremental.incremental_link`` links each micro-batch against a STATIC
y-side; this module closes the remaining streaming-ER gap: a feed of
organization mentions resolved against a directory that the stream itself
builds — every batch either assigns a mention to an entity already in the
directory (match) or mints a new entity (create), and the directory grows
by the batch's novel aliases. The batch analogue is the reference's alias
bridge (its directory ships precomputed, ``LinkOrgs/R/LinkOrgs_LinkOrgs.R:
460-477``); here the directory is BUILT online, which is how a production
mention stream actually bootstraps one.

State on disk, same layout discipline as the dedup streams
(``neardup.py`` / ``embed_neardup.py``):

  * ``history/grams``    — (gram, alias_id): trigram posting lists of every
    directory alias, a catalog table partitioned by ``batch_id`` and
    hash-bucketed on ``gram`` — the candidate join's history side scans
    WITHOUT an Exchange; only the micro-batch side shuffles (into
    ``num_history_buckets`` partitions).
  * ``history/entities`` — (alias_id, entity_id, name_norm): the alias
    directory itself. Plain ``batch_id=N`` parquet — only ever read
    id-joined at candidate volume (verification), never scanned.
  * ``assignments/batch_id=N`` — the batch's resolved rows (idempotent
    overwrite: a replayed batch overwrites its own output).

Per micro-batch N:
  1. normalize mention names (``prepare_side`` — reference normalization);
     work at DISTINCT-name granularity (node id = ``xxhash64(name_norm)``,
     the same content-keyed id rule as ``record_id_expr``).
  2. MATCH: batch trigrams equi-join the PRIOR gram history
     (``batch_id != N`` — replay must not see its own failed attempt),
     df-capped on BOTH sides; the reference's >= ceil(min_shared_frac ·
     |trigrams(name)|) rule gates candidates; candidates verify by
     ``cfg.distance_measure`` against the alias strings (id-join into the
     entities slice); best match per name = min (distance, entity_id).
  3. CREATE: names with no acceptable match pair among THEMSELVES (a
     self-join straight off the batch's persisted gram index, verified by
     ``cfg.distance_measure`` at ``create_max_dist``) and resolve
     transitively via ``connected_components`` — a batch introducing
     "acme corp" and "acme corp." mints ONE entity. The entity id is the
     component minimum of the member name hashes: content-derived, so a
     replayed batch mints byte-identical ids.
  4. append the directory delta: every new entity's aliases, plus each
     MATCHED name whose exact normalized form was new to the directory
     (distance > 0 — an exact-form alias would have matched at 0). Both
     slices written to ``batch_id=N`` (idempotent overwrite), grams
     bucketed via ``write_history_bucketed``.

Append-only semantics, stated honestly: within the stream the directory
never MERGES two existing entities — a mention similar to aliases of two
entities joins the closest one and the entities stay distinct. The merge
pass is ``compact_directory`` (below): a periodic offline
``merge_entities`` self-link over the accumulated directory that rewrites
the entity slices through the fold and records the id remap under
``remaps/``. And within a batch, a name that matched the directory does
not also bridge into the batch's new-entity graph — match beats create.

At stream lifetime scale the gram history is compacted with the shared
tiered scheme (``history.maybe_compact``): metadata and file count stay
O(compact_every), snapshot rewrites amortize to O(history/K²).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import register_cache, scoped_caches
from ..config import DEFAULT, LinkConfig
from ..functions.normalize import NORM_COL, prepare_side
from ..functions.scorers import distance_expr
from ..operators.blocking import apply_df_cap, gram_index
from ..operators.cluster import connected_components
from .dedup import _prior_history_paths
from .history import (
    compact_plain_history,
    history_table_name,
    maybe_compact,
    read_prior_history,
    recommended_history_buckets,
    write_history_bucketed,
)


def resolve_batch(
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    *,
    name_col: str = "name",
    cfg: LinkConfig = DEFAULT,
    max_dist: float = 0.5,
    create_max_dist: float | None = None,
    num_history_buckets: int | None = None,
    compact_every: int | None = None,
) -> None:
    """Process one micro-batch (public, so replay behaviour is testable).

    ``max_dist`` gates MATCHING a mention to an existing directory alias;
    ``create_max_dist`` (default: same) gates MERGING two new names into
    one fresh entity. They are different decisions with different costs:
    matching compares a mention against aliases of the SAME entity
    (lenient is right — surface variants of one org differ in suffix or
    typo), while the create-stage self-join compares DIFFERENT candidate
    entities, where the same leniency fuses near-named competitors into
    one id that no later batch can split (the directory is append-only).
    Production setting: lenient ``max_dist``, strict ``create_max_dist``.
    """
    with scoped_caches():
        _resolve_batch_inner(
            batch_df,
            batch_id,
            out_dir,
            name_col=name_col,
            cfg=cfg,
            max_dist=max_dist,
            create_max_dist=max_dist if create_max_dist is None else create_max_dist,
            num_history_buckets=num_history_buckets,
            compact_every=compact_every,
        )


def _resolve_batch_inner(
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    *,
    name_col: str,
    cfg: LinkConfig,
    max_dist: float,
    create_max_dist: float,
    num_history_buckets: int | None,
    compact_every: int | None,
) -> None:
    if num_history_buckets is None:  # scale-adaptive default; only the
        # table-creating first batch actually consumes the resolved value
        num_history_buckets = recommended_history_buckets(batch_df)
    grams_dir = os.path.join(out_dir, "history", "grams")
    entities_dir = os.path.join(out_dir, "history", "entities")
    assign_dir = os.path.join(out_dir, "assignments")
    spark = batch_df.sparkSession
    grams_tbl = history_table_name(out_dir, "grams")
    if compact_every is not None:
        maybe_compact(
            spark,
            watermark=batch_id,
            every=compact_every,
            bucketed=(grams_tbl, grams_dir),
            plain_paths=(entities_dir,),
        )

    prep = register_cache(
        prepare_side(batch_df, name_col, "_rid", cfg).persist()
    )
    # distinct-name granularity: every downstream join is per normalized
    # name; the final assignment fan-out back to rows is one equi-join.
    # The node id IS prepare_side's content-hash id (xxhash64(name_norm)),
    # so the fan-out join key already sits on every prepared row.
    names = register_cache(
        prep.select(NORM_COL, F.col("_rid").alias("_nid")).distinct().persist()
    )
    tri = register_cache(gram_index(names, "_nid", cfg).persist())
    ntri = tri.groupBy("_nid").agg(F.count(F.lit(1)).alias("_n_grams"))
    # One cheap count on the cached distinct-name frame buys two plan
    # prunings per batch: a gram's posting list in `tri` (distinct per
    # name) is bounded by the batch's distinct-name count, so when
    # n_names <= max_block_df the batch-side df-caps are PROVABLY no-ops
    # and their aggregate + broadcast + anti-join subtrees are skipped
    # outright (the history side still caps — its posting lists track
    # directory lifetime). Same guard idiom as neardup_batch's
    # n_banded check.
    n_names = names.count()
    batch_cap_bites = (
        cfg.max_block_df is not None and n_names > cfg.max_block_df
    )
    # Jaccard verify/create scoring joins PRE-COMPUTED per-name q-gram
    # sets and sizes (one set build per distinct name) instead of
    # rebuilding both sets inside every candidate-pair row — the same
    # once-per-name trick as operators.scoring.score_pairs, with
    # bit-identical distance arithmetic (jaccard_dist_from_sizes_expr).
    # Round-7 profiling: batch 0 of the bench workload scores ~5e5
    # create-path candidate pairs, and the per-pair double set build was
    # the largest single CPU sink of the whole query.
    use_jac = cfg.distance_measure == "jaccard"
    if use_jac:
        from ..functions.qgrams import (
            jaccard_dist_from_sizes_expr,
            packed_qgram_set_expr,
            qgram_set_expr,
        )

        # packed bigint sets for q <= 3: same cardinalities, ~4.5x
        # cheaper per-pair intersect (see packed_qgram_set_expr)
        _set_expr = (
            packed_qgram_set_expr if cfg.qgram <= 3 else qgram_set_expr
        )
        names_g = register_cache(
            names.select(
                "_nid", _set_expr(NORM_COL, cfg.qgram).alias("_gset")
            )
            .withColumn("_gsz", F.size("_gset"))
            .persist()
        )

    # ---- 2. MATCH against the prior directory -------------------------
    prior_grams = read_prior_history(spark, grams_tbl, grams_dir, batch_id)
    prior_ent_paths = _prior_history_paths(spark, entities_dir, batch_id)
    matched = None
    if prior_grams is not None and prior_ent_paths:
        btri = tri
        old = prior_grams.select("gram", "alias_id")
        if batch_cap_bites:
            btri = apply_df_cap(btri, "gram", cfg.max_block_df)
        if cfg.max_block_df is not None:
            old = apply_df_cap(old, "gram", cfg.max_block_df)
        shared = (
            btri.join(old, "gram")
            .groupBy("_nid", "alias_id")
            .agg(F.count(F.lit(1)).alias("_shared"))
        )
        cand = shared.join(ntri, "_nid").filter(
            F.col("_shared")
            >= F.ceil(F.lit(float(cfg.min_shared_frac)) * F.col("_n_grams"))
        )
        aliases = spark.read.parquet(*prior_ent_paths).select(
            "alias_id", "entity_id", F.col(NORM_COL).alias("_alias_norm")
        )
        if use_jac:
            # per-alias set computed below the join (once per directory
            # alias row), per-name set joined from the cached names_g
            aliases = aliases.select(
                "alias_id",
                "entity_id",
                _set_expr("_alias_norm", cfg.qgram).alias("_aset"),
            ).withColumn("_asz", F.size("_aset"))
            dist = jaccard_dist_from_sizes_expr("_gset", "_aset", "_gsz", "_asz")
            verified = (
                cand.join(aliases, "alias_id")
                .join(names_g, "_nid")
                .withColumn("_dist", dist)
                .filter(F.col("_dist") <= F.lit(float(max_dist)))
            )
        else:
            verified = (
                cand.join(aliases, "alias_id")
                .join(names, "_nid")
                .withColumn(
                    "_dist",
                    distance_expr(
                        cfg.distance_measure, NORM_COL, "_alias_norm", qgram=cfg.qgram
                    ),
                )
                .filter(F.col("_dist") <= F.lit(float(max_dist)))
            )
        matched = register_cache(
            verified.groupBy("_nid")
            .agg(
                F.min_by(
                    F.struct(
                        F.col("entity_id"), F.col("_dist").alias("stringdist")
                    ),
                    F.struct(F.col("_dist"), F.col("entity_id")),
                ).alias("_best")
            )
            .select("_nid", "_best.entity_id", "_best.stringdist")
            .persist()
        )

    # ---- 3. CREATE entities for the unmatched names -------------------
    unmatched = names
    if matched is not None:
        unmatched = names.join(matched, "_nid", "left_anti")
    # candidate self-join straight off the PERSISTED batch gram index
    # (candidate_pairs would re-explode both sides from scratch — two more
    # gram builds and df-cap aggregates per micro-batch for frames this
    # batch already computed). Same semantics: df-cap, then the
    # >= ceil(min_shared_frac * |grams(x)|) rule with the PRE-cap
    # denominator (monotone-under-capping contract, blocking.py).
    utri = tri.join(unmatched.select("_nid"), "_nid", "left_semi")
    if batch_cap_bites:  # utri ⊆ tri, so the same n_names bound applies
        utri = apply_df_cap(utri, "gram", cfg.max_block_df)
    cand_new = (
        utri.select(F.col("_nid").alias("x_id"), "gram")
        .join(utri.select(F.col("_nid").alias("y_id"), "gram"), "gram")
        .filter(F.col("x_id") < F.col("y_id"))
        .groupBy("x_id", "y_id")
        .agg(F.count(F.lit(1)).alias("_shared"))
        .join(
            ntri.select(F.col("_nid").alias("x_id"), "_n_grams"), "x_id"
        )
        .filter(
            F.col("_shared")
            >= F.ceil(F.lit(float(cfg.min_shared_frac)) * F.col("_n_grams"))
        )
    )
    # persist BEFORE the threshold filter (the pushdown-into-join guard
    # score_pairs applies, here registry-tracked so scoped_caches releases
    # it at batch end instead of pinning one frame per micro-batch)
    if use_jac:
        # project the pair down to (ids, stringdist) BEFORE the persist:
        # the joined-in gram-set arrays exist only to feed the distance
        # expression, and caching array<string> columns for every
        # candidate pair is slower than the scoring they save (nested
        # types defeat the columnar cache) — measured as a 2x regression
        # of the whole query before this select was added
        scored = register_cache(
            cand_new.join(
                names_g.select(
                    F.col("_nid").alias("x_id"),
                    F.col("_gset").alias("_gx"),
                    F.col("_gsz").alias("_nx"),
                ),
                "x_id",
            )
            .join(
                names_g.select(
                    F.col("_nid").alias("y_id"),
                    F.col("_gset").alias("_gy"),
                    F.col("_gsz").alias("_ny"),
                ),
                "y_id",
            )
            .select(
                "x_id",
                "y_id",
                jaccard_dist_from_sizes_expr("_gx", "_gy", "_nx", "_ny").alias(
                    "stringdist"
                ),
            )
            .persist()
        )
    else:
        scored = register_cache(
            cand_new.join(
                names.select(F.col("_nid").alias("x_id"), F.col(NORM_COL).alias("_nx")),
                "x_id",
            )
            .join(
                names.select(F.col("_nid").alias("y_id"), F.col(NORM_COL).alias("_ny")),
                "y_id",
            )
            .withColumn(
                "stringdist",
                distance_expr(cfg.distance_measure, "_nx", "_ny", qgram=cfg.qgram),
            )
            .persist()
        )
    edges = register_cache(
        scored.filter(F.col("stringdist") <= F.lit(float(create_max_dist)))
        .select(F.col("x_id").alias("src"), F.col("y_id").alias("dst"))
        .persist()
    )
    if edges.limit(1).count() == 0:
        # no similar pairs among the new names: all singletons — skip the
        # iterative CC (whose per-round jobs would re-drive nothing)
        created = register_cache(
            unmatched.select(
                "_nid", NORM_COL, F.col("_nid").alias("entity_id")
            ).persist()
        )
    else:
        comp = connected_components(edges)
        created = register_cache(
            unmatched.join(comp.withColumnRenamed("id", "_nid"), "_nid", "left")
            .select(
                "_nid",
                NORM_COL,
                F.coalesce(F.col("component"), F.col("_nid")).alias("entity_id"),
            )
            .persist()
        )

    # ---- assignment output (idempotent overwrite) ---------------------
    assign_created = created.select(
        "_nid",
        "entity_id",
        F.lit(None).cast("double").alias("stringdist"),
        F.lit(False).alias("matched_prior"),
    )
    if matched is not None:
        assign = matched.withColumn("matched_prior", F.lit(True)).unionByName(
            assign_created
        )
    else:
        assign = assign_created
    out_rows = prep.join(assign.withColumnRenamed("_nid", "_rid"), "_rid")
    out_rows.write.mode("overwrite").parquet(f"{assign_dir}/batch_id={batch_id}")

    # ---- 4. directory delta: new entities' aliases + novel alias forms
    new_aliases = created.select("_nid", NORM_COL, "entity_id")
    if matched is not None:
        novel_matched = (
            matched.filter(F.col("stringdist") > 0)
            .join(names, "_nid")
            .select("_nid", NORM_COL, "entity_id")
        )
        new_aliases = new_aliases.unionByName(novel_matched)
    new_aliases = register_cache(
        new_aliases.withColumnRenamed("_nid", "alias_id").persist()
    )
    write_history_bucketed(
        tri.join(
            new_aliases.select(F.col("alias_id").alias("_nid")), "_nid", "left_semi"
        ).select("gram", F.col("_nid").alias("alias_id")),
        grams_tbl,
        grams_dir,
        batch_id,
        bucket_cols=("gram",),
        num_buckets=num_history_buckets,
    )
    new_aliases.select("alias_id", "entity_id", NORM_COL).write.mode(
        "overwrite"
    ).parquet(f"{entities_dir}/batch_id={batch_id}")


def compact_directory(
    spark,
    out_dir: str,
    *,
    watermark: int,
    cfg: LinkConfig = DEFAULT,
    max_dist: float = 0.5,
):
    """The periodic entity-MERGE pass the append-only directory defers to
    (module docstring): fuzzily self-link the accumulated alias directory
    (``plans.multi.merge_entities`` — df-capped gram blocking, distance
    verify at ``max_dist``, pointer-jumping components) and fold every
    committed entity slice below ``watermark`` into ONE snapshot slice
    with the merged entity ids, via ``compact_plain_history``'s transform
    hook (one write, not fold-then-rewrite).

    ``watermark`` must be an UNCOMMITTED batch id (the next batch the
    stream will process): slices at/above it are neither read nor folded,
    so a replaying batch still sees exactly the history it is contracted
    to see. Call between batches — e.g. every K batches from the caller,
    or offline while the stream is down.

    Returns the REMAP frame ``(entity_id, merged_entity_id)`` — only the
    entities whose id changed — read back from its durable home
    ``out_dir/remaps/watermark=N`` (so its lineage survives the fold's
    deletes); ``None`` when nothing merged. Already-written assignment
    slices are NOT rewritten (they are outputs, not state): remap them
    lazily with ``plans.multi.apply_entity_remap`` over the accumulated
    ``remaps/`` frames, oldest first.

    Crash safety, same discipline as the tiered folds: the snapshot is
    written and renamed in before the folded slices are deleted, so a
    crash leaves at worst DUPLICATE alias rows — one with the old entity
    id, one with the merged id. That window degrades gracefully: the
    merged id is the component MINIMUM, and the match path's best-alias
    pick breaks distance ties on ``min(entity_id)``, so a mention seeing
    both rows still resolves to the merged id.

    The gram history is untouched: it maps ``gram -> alias_id`` and the
    merge rewrites only ``alias -> entity``, which is why this pass costs
    one directory self-link plus one entities rewrite — never a rebuild
    of the bucketed gram index."""
    from ..plans.multi import merge_entities

    entities_dir = os.path.join(out_dir, "history", "entities")
    paths = _prior_history_paths(spark, entities_dir, watermark)
    if not paths:
        return None
    remap_path = os.path.join(out_dir, "remaps", f"watermark={watermark}")
    with scoped_caches():
        dir_df = spark.read.parquet(*paths)
        remap = register_cache(
            merge_entities(
                dir_df, cfg, max_dist=max_dist,
                entity_col="entity_id", name_col=NORM_COL,
            )
            .filter(F.col("entity_id") != F.col("merged_entity_id"))
            .persist()
        )
        if remap.limit(1).count() == 0:
            return None
        remap.write.mode("overwrite").parquet(remap_path)
    saved = spark.read.parquet(remap_path)

    def _remap_entities(df: DataFrame) -> DataFrame:
        return (
            df.join(
                saved.withColumnRenamed("merged_entity_id", "_m"),
                "entity_id",
                "left",
            )
            .withColumn("entity_id", F.coalesce("_m", F.col("entity_id")))
            .drop("_m")
        )

    compact_plain_history(
        spark, entities_dir, watermark=watermark,
        transform=_remap_entities, min_fold=1,
    )
    return saved


def incremental_resolve(
    mentions_stream: DataFrame,
    out_dir: str,
    checkpoint_path: str,
    *,
    name_col: str = "name",
    cfg: LinkConfig = DEFAULT,
    max_dist: float = 0.5,
    create_max_dist: float | None = None,
    num_history_buckets: int | None = None,
    compact_every: int | None = None,
    merge_every: int | None = None,
    merge_max_dist: float | None = None,
    available_now: bool = False,
):
    """Start a streaming query resolving each micro-batch of mentions
    against the evolving directory. Resolved rows land in
    ``out_dir/assignments/batch_id=N``; directory state under
    ``out_dir/history``.

    ``merge_every=K`` runs ``compact_directory`` before every K-th batch
    (watermark = the incoming batch id, which is by construction
    uncommitted — exactly the contract the merge pass requires), at
    ``merge_max_dist`` (default: ``max_dist`` — two entities either of
    which a mention at that distance could join are operationally one).
    Replay-safe: a crashed-and-replayed K-th batch re-runs the merge
    against the already-merged directory, which finds nothing and no-ops.
    Remaps accumulate durably under ``out_dir/remaps``; already-written
    assignment slices are remapped lazily by the consumer
    (``plans.multi.apply_entity_remap``), never rewritten in place."""

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        if merge_every is not None and batch_id > 0 and batch_id % merge_every == 0:
            compact_directory(
                batch_df.sparkSession,
                out_dir,
                watermark=batch_id,
                cfg=cfg,
                max_dist=max_dist if merge_max_dist is None else merge_max_dist,
            )
        resolve_batch(
            batch_df,
            batch_id,
            out_dir,
            name_col=name_col,
            cfg=cfg,
            max_dist=max_dist,
            create_max_dist=create_max_dist,
            num_history_buckets=num_history_buckets,
            compact_every=compact_every,
        )

    writer = (
        mentions_stream.writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
