"""Pairwise scoring of blocked candidates.

Reference: candidates surviving the shared-trigram filter are scored with
``stringdist`` and kept when ``dist <= MaxDist``
(``LinkOrgs/R/LinkOrgs_PFuzzyDiscreteInternal.R:140-148``) — a theta join
realized, as in every Spark ER engine, as block → score → filter.

The names needed for scoring are attached by two equi-joins against the
deduplicated (id, name) side tables (the reference's positional
``cbind(x[ix,], y[iy,])`` re-join — ``PFuzzyDiscreteFullFxn.R:84-88``).
``repartitionByRange`` on the pair key before a pandas-UDF scorer keeps
Arrow batches balanced when block sizes are skewed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..config import LinkConfig
from ..functions.normalize import NORM_COL
from ..functions.qgrams import (
    jaccard_dist_from_sizes_expr,
    packed_qgram_set_expr,
    qgram_set_expr,
)
from ..functions.scorers import distance_expr

DIST_COL = "stringdist"


def score_pairs(
    pairs: DataFrame,
    x_prep: DataFrame,
    y_prep: DataFrame,
    cfg: LinkConfig,
    *,
    x_id: str = "x_id",
    y_id: str = "y_id",
    max_dist: float | None = None,
) -> DataFrame:
    """Attach normalized names, score, and (optionally) threshold-filter.

    Returns ``(x_id, y_id, name_norm_x, name_norm_y, stringdist)``.
    """
    xn = x_prep.select(F.col(x_id), F.col(NORM_COL).alias("name_norm_x")).dropDuplicates([x_id])
    yn = y_prep.select(F.col(y_id), F.col(NORM_COL).alias("name_norm_y")).dropDuplicates([y_id])

    if cfg.distance_measure == "jaccard":
        # Precompute each side's q-gram set AND its size ONCE per distinct
        # name (n rows) instead of per candidate pair (can be 1000x more
        # rows): the per-pair work drops to ONE array_intersect — the union
        # size is |A|+|B|−|A∩B| from the joined-in per-side sizes. For
        # q <= 3 the sets are PACKED bigint arrays (injective code-point
        # pack, identical cardinalities/intersections): long hashing makes
        # the per-pair intersect ~4.5x cheaper than UTF8String hashing.
        set_expr = (
            packed_qgram_set_expr if cfg.qgram <= 3 else qgram_set_expr
        )
        xn = xn.withColumn("_gx", set_expr("name_norm_x", cfg.qgram)).withColumn(
            "_nx", F.size("_gx")
        )
        yn = yn.withColumn("_gy", set_expr("name_norm_y", cfg.qgram)).withColumn(
            "_ny", F.size("_gy")
        )
        dist = jaccard_dist_from_sizes_expr("_gx", "_gy", "_nx", "_ny")
    else:
        dist = distance_expr(
            cfg.distance_measure, "name_norm_x", "name_norm_y", qgram=cfg.qgram
        )

    scored = (
        pairs.select(x_id, y_id)
        .join(xn, x_id)
        .join(yn, y_id)
        .withColumn(DIST_COL, dist)
        .drop("_gx", "_gy", "_nx", "_ny")
    )
    if max_dist is not None and max_dist != float("inf"):
        # Materialization barrier before the filter: Catalyst otherwise
        # pushes the predicate INTO the scoring join's condition, where the
        # distance expression is evaluated on every probe row twice
        # (condition + projection) — measured ~8x slower than scoring once.
        # Explicit MEMORY_AND_DISK: an oversized scored stage spills to local
        # disk instead of evicting/OOMing executors (at prod scale the
        # StageCheckpointer persists this stage durably instead —
        # plans/pipeline.py routes through it when one is configured).
        scored = scored.persist(StorageLevel.MEMORY_AND_DISK_DESER)
        scored = scored.filter(F.col(DIST_COL) <= F.lit(float(max_dist)))
    return scored


def explain_pairs(
    pairs: DataFrame,
    cfg: LinkConfig,
    *,
    name_x: str = "name_x",
    name_y: str = "name_y",
    measures: tuple = ("jaccard", "levenshtein", "jw", "osa"),
) -> DataFrame:
    """Match EXPLAINABILITY surface: for each raw name pair, the
    normalized forms, the blocking evidence (shared / total trigram
    counts and whether the pair would survive the >= ceil(5%) blocking
    rule), and the full panel of distances — what an ER practitioner
    reads to understand why a pair did (or did not) match, and to pick
    thresholds. A debugging/triage tool, not a pipeline stage: run it on
    a HANDFUL of pairs (it scores every requested measure per row).
    """
    from ..functions.normalize import normalize_expr
    from ..functions.qgrams import qgram_array_expr

    nx = normalize_expr(
        name_x,
        to_lower=cfg.to_lower,
        norm_space=cfg.norm_space,
        remove_punct=cfg.remove_punct,
    )
    ny = normalize_expr(
        name_y,
        to_lower=cfg.to_lower,
        norm_space=cfg.norm_space,
        remove_punct=cfg.remove_punct,
    )
    d = pairs.withColumn("name_norm_x", nx).withColumn("name_norm_y", ny)
    gx = F.array_distinct(qgram_array_expr("name_norm_x", 3, tails=False))
    gy = F.array_distinct(qgram_array_expr("name_norm_y", 3, tails=False))
    d = (
        d.withColumn("_gx", gx)
        .withColumn("_gy", gy)
        .withColumn("n_grams_x", F.size("_gx"))
        .withColumn("n_grams_y", F.size("_gy"))
        .withColumn("shared_grams", F.size(F.array_intersect("_gx", "_gy")))
        .withColumn(
            "would_block",
            F.col("shared_grams")
            >= F.ceil(F.lit(float(cfg.min_shared_frac)) * F.col("n_grams_x")),
        )
    )
    for m in measures:
        d = d.withColumn(
            f"dist_{m}",
            distance_expr(m, "name_norm_x", "name_norm_y", qgram=cfg.qgram),
        )
    return d.drop("_gx", "_gy")


def tfidf_cosine_scores(
    pairs: DataFrame,
    x_prep: DataFrame,
    y_prep: DataFrame,
    *,
    x_id: str = "x_id",
    y_id: str = "y_id",
    min_sim: float | None = None,
) -> DataFrame:
    """IDF-weighted token cosine over blocked candidate pairs — the
    classic TF-IDF name matcher (Cohen-Ravikumar-Fienberg 2003's TFIDF
    baseline, exact-token variant). Corporate boilerplate ("inc", "llc",
    "corp") appears in a huge fraction of org names, so edit and set
    distances over-credit suffix agreement; IDF weighting makes a shared
    RARE token worth far more than a shared ubiquitous one — the
    scoring-side counterpart of the blocking df-cap's stop-gram rule
    (``blocking.apply_df_cap`` drops those grams from CANDIDATE
    generation; this down-weights them in the SCORE).

    Definitions (all replicated by the DuckDB oracle): the corpus is the
    DISTINCT normalized names of both sides together (N names); token
    df = number of distinct names containing the token; idf =
    ln((N+1)/(df+1)) + 1 (the sklearn smooth convention this repo's
    ``tfidf_top_terms`` already uses); per-name weights tf·idf,
    L2-normalized, so ``tfidf_sim`` = Σ shared-token wx·wy ∈ [0, 1]
    (rounded to 6 dp — float-sum order differs across engines).

    Returns ``(x_id, y_id, name_norm_x, name_norm_y, tfidf_sim)``; pairs
    sharing NO token score 0.0. ``min_sim`` filters (a SIMILARITY, so >=).

    Scale shape: tokenization and weights are computed per DISTINCT NAME
    (n rows, never per pair); the pair score is two id-equi-joins — pairs
    to x token rows, then y token rows on (id, token) — so per-pair work
    is bounded by shared-token count. No UDFs, no cross products; the
    idf table is one bounded-vocabulary aggregate.
    """
    xn = x_prep.select(F.col(x_id), F.col(NORM_COL).alias("_nx")).dropDuplicates([x_id])
    yn = y_prep.select(F.col(y_id), F.col(NORM_COL).alias("_ny")).dropDuplicates([y_id])
    corpus = (
        xn.select(F.col("_nx").alias("_name"))
        .unionByName(yn.select(F.col("_ny").alias("_name")))
        .distinct()
    )
    n_names = corpus.groupBy().agg(F.count(F.lit(1)).alias("_n"))
    tok = corpus.select(
        "_name", F.explode(F.split("_name", " ")).alias("_tok")
    ).filter(F.length("_tok") > 0)
    tf = tok.groupBy("_name", "_tok").agg(F.count(F.lit(1)).alias("_tf"))
    idf = (
        tf.groupBy("_tok")
        .agg(F.count(F.lit(1)).alias("_df"))
        .crossJoin(F.broadcast(n_names))
        .select(
            "_tok",
            (F.log((F.col("_n") + F.lit(1.0)) / (F.col("_df") + F.lit(1.0))) + F.lit(1.0)).alias("_idf"),
        )
    )
    w = tf.join(idf, "_tok").select(
        "_name", "_tok", (F.col("_tf") * F.col("_idf")).alias("_w")
    )
    norm = w.groupBy("_name").agg(F.sqrt(F.sum(F.col("_w") * F.col("_w"))).alias("_l2"))
    unit = w.join(norm, "_name").select(
        "_name", "_tok", (F.col("_w") / F.col("_l2")).alias("_u")
    )
    px = pairs.select(x_id, y_id).join(xn, x_id).join(yn, y_id)
    shared = (
        px.join(unit.withColumnRenamed("_name", "_nx").withColumnRenamed("_u", "_ux"), ["_nx"])
        .join(
            unit.withColumnRenamed("_name", "_ny").withColumnRenamed("_u", "_uy"),
            ["_ny", "_tok"],
        )
        .groupBy(x_id, y_id)
        .agg(F.sum(F.col("_ux") * F.col("_uy")).alias("_sim"))
    )
    out = (
        px.join(shared, [x_id, y_id], "left")
        .select(
            x_id,
            y_id,
            F.col("_nx").alias("name_norm_x"),
            F.col("_ny").alias("name_norm_y"),
            F.round(F.coalesce(F.col("_sim"), F.lit(0.0)), 6).alias("tfidf_sim"),
        )
    )
    if min_sim is not None:
        out = out.filter(F.col("tfidf_sim") >= F.lit(float(min_sim)))
    return out


def triage_pairs(
    scored: DataFrame,
    *,
    match_max: float,
    review_max: float,
    dist_col: str = DIST_COL,
) -> DataFrame:
    """Three-zone decision over scored pairs (the Fellegi-Sunter link /
    possible-link / non-link partition, distance-thresholded): distance
    <= ``match_max`` ⇒ ``"match"``; <= ``review_max`` ⇒ ``"review"`` (the
    clerical-review queue a production ER pipeline exports for humans);
    else ``"non_match"``. NULL distances (a scorer that could not compare)
    land in ``"review"`` too — an uncomparable pair is exactly what a
    human should see, never a silent drop.

    Pure projection (one CASE column appended); thresholds are validated
    (``match_max <= review_max``) so the zones cannot silently invert."""
    if match_max > review_max:
        raise ValueError(
            f"match_max ({match_max}) must be <= review_max ({review_max})"
        )
    d = F.col(dist_col)
    return scored.withColumn(
        "decision",
        F.when(d.isNull(), F.lit("review"))
        .when(d <= F.lit(float(match_max)), F.lit("match"))
        .when(d <= F.lit(float(review_max)), F.lit("review"))
        .otherwise(F.lit("non_match")),
    )
