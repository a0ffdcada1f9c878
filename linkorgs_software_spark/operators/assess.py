"""Match-quality evaluation — the F1 >= 0.99 gate.

Reference semantics (``LinkOrgs/R/LinkOrgs_AssessMatches.R:51-91``): dedup
both pair sets, then count membership — TP = predicted ∩ truth,
FP = predicted \\ truth, FN = truth \\ predicted, and
TN = n_distinct(x) * n_distinct(y) − TP − FP − FN. The reference's hashed
``%fin%`` membership becomes semi/anti joins (its own Spark analogue).
F1 = 2TP / (2TP + FP + FN), computed on the driver from four counts.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import register_cache


@dataclass(frozen=True)
class MatchAssessment:
    tp: int
    fp: int
    fn: int
    tn: int

    @property
    def precision(self) -> float:
        d = self.tp + self.fp
        return self.tp / d if d else 0.0

    @property
    def recall(self) -> float:
        d = self.tp + self.fn
        return self.tp / d if d else 0.0

    @property
    def f1(self) -> float:
        d = 2 * self.tp + self.fp + self.fn
        return 2 * self.tp / d if d else 0.0


def _dedup_pairs(df: DataFrame, name_x: str, name_y: str) -> DataFrame:
    return df.select(
        F.col(name_x).alias("name_x"), F.col(name_y).alias("name_y")
    ).dropDuplicates(["name_x", "name_y"])


def assess_match_performance(
    z: DataFrame,
    z_true: DataFrame,
    *,
    n_x: int,
    n_y: int,
    name_x: str = "name_x",
    name_y: str = "name_y",
) -> MatchAssessment:
    """Confusion counts for predicted pairs ``z`` against truth ``z_true``.

    ``n_x`` / ``n_y`` are the distinct-name counts of the two input tables
    (the TN universe, ``AssessMatches.R:64``).
    """
    # Cache both deduped pair sets: ``z`` is typically the full linkage
    # plan — without the cache each confusion count would re-run the whole
    # pipeline (blocking + scoring + windows) once per count.
    pred = _dedup_pairs(z, name_x, name_y).cache()
    truth = _dedup_pairs(z_true, name_x, name_y).cache()

    keys = ["name_x", "name_y"]
    # TP and FP in one pass over pred; FN in one pass over truth.
    marked = pred.join(truth.withColumn("_t", F.lit(1)), keys, "left")
    row = marked.agg(
        F.count(F.when(F.col("_t").isNotNull(), 1)).alias("tp"),
        F.count(F.when(F.col("_t").isNull(), 1)).alias("fp"),
    ).collect()[0]
    tp, fp = row["tp"], row["fp"]
    fn = truth.join(pred, keys, "left_anti").count()
    tn = n_x * n_y - tp - fp - fn
    return MatchAssessment(tp=tp, fp=fp, fn=fn, tn=tn)


def assess_blocking(
    cand_pairs: DataFrame,
    truth_pairs: DataFrame,
    *,
    n_x: int,
    n_y: int,
    name_x: str = "name_x",
    name_y: str = "name_y",
) -> DataFrame:
    """Blocking-stage quality as one summary row (standard ER blocking
    metrics): ``pairs_completeness`` = fraction of true pairs surviving
    candidate generation (recall ceiling for every downstream scorer) and
    ``reduction_ratio`` = 1 − candidates / (n_x·n_y) (how much of the
    quadratic comparison space blocking eliminated).

    Tuning blocking keys at scale IS the trade between these two numbers —
    a df-cap or a tighter shared-gram threshold moves both, so the engine
    exposes them as a first-class measurement rather than leaving candidate
    quality to be discovered from end-to-end F1 regressions. Returns a
    1-row DataFrame (no driver-side collect; the three aggregates are
    scalar frames joined by cross product, each a map-side count).
    """
    cand = _dedup_pairs(cand_pairs, name_x, name_y)
    truth = _dedup_pairs(truth_pairs, name_x, name_y)
    keys = ["name_x", "name_y"]
    covered = truth.join(cand, keys, "left_semi")
    a = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    b = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    c = covered.agg(F.count(F.lit(1)).alias("n_covered"))
    return (
        a.crossJoin(b)
        .crossJoin(c)
        .select(
            "n_candidates",
            "n_truth",
            "n_covered",
            F.round(
                F.when(F.col("n_truth") > 0, F.col("n_covered") / F.col("n_truth"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("pairs_completeness"),
            F.round(
                F.lit(1.0) - F.col("n_candidates") / F.lit(float(n_x) * float(n_y)), 6
            ).alias("reduction_ratio"),
        )
    )


def skew_profile(
    df: DataFrame,
    key_cols,
    *,
    top_n: int = 10,
) -> DataFrame:
    """Join/groupBy key skew diagnostics: the ``top_n`` heaviest keys with
    their share of all rows and a skew factor vs the mean key — the
    measurement to run BEFORE committing a big shuffle at 100 TB, and the
    evidence for choosing a df-cap, salting, or AQE skew handling (every
    LSH/blocking family in this engine caps exactly the keys this report
    surfaces).

    Returns ``(key, n_rows, row_share, skew_factor, rank)``:
    ``skew_factor`` = key rows / mean rows per key (1.0 = average key).

    Scale shape: one count aggregate on the key (the same shuffle the
    diagnosed join would do, but map-side reduced), one scalar totals row,
    and an ``orderBy().limit()`` top-n (TakeOrderedAndProject — no global
    window over the key vocabulary); the ranked frame is ``top_n`` rows,
    so the rank window is a deliberate tiny single task. round(·, 6) and
    (count desc, key asc) tie order keep it oracle-portable.
    """
    from pyspark.sql import Window

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in keys])
    # persisted + registered (cache.release_caches lifecycle): the eager
    # totals collect below and the returned top-n plan otherwise each run
    # the full key-count shuffle — doubling the cost of the very shuffle
    # this diagnostic exists to measure
    counts = register_cache(
        df.select(key.alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .persist()
    )
    tot = counts.agg(
        F.sum("n_rows").alias("_t"), F.count(F.lit(1)).alias("_k")
    ).collect()[0]
    total, nkeys = int(tot["_t"] or 0), int(tot["_k"] or 0)
    if total == 0:
        return counts.select(
            "key",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.lit(0.0).alias("row_share"),
            F.lit(0.0).alias("skew_factor"),
            F.lit(0).cast("long").alias("rank"),
        )
    mean = total / nkeys
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key").asc())
    return (
        counts.orderBy(F.col("n_rows").desc(), F.col("key").asc())
        .limit(top_n)
        .withColumn("rank", F.row_number().over(w))
        .select(
            "key",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.round(F.col("n_rows") / F.lit(float(total)), 6).alias("row_share"),
            F.round(F.col("n_rows") / F.lit(float(mean)), 6).alias("skew_factor"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def b3_scores(
    pred: DataFrame,
    truth: DataFrame,
    *,
    id_col: str = "id",
    pred_col: str = "pred_cluster",
    true_col: str = "true_cluster",
    unmatched: str = "drop",
) -> DataFrame:
    """B-cubed clustering precision/recall/F1 (Bagga & Baldwin 1998) — the
    standard CLUSTER-level entity-resolution metric, complementing the
    pairwise F1 gate (``assess_match_performance``): pairwise F1 weights
    big clusters quadratically, B³ averages per RECORD, so a handful of
    giant merged clusters can no longer hide many small mistakes.

    One row ``(n_records, b3_precision, b3_recall, b3_f1)``. For record e:
    P(e) = |pred(e) ∩ true(e)| / |pred(e)|, R(e) = the same over
    |true(e)|; scores are means over records.

    ``unmatched`` controls records present in only one assignment:
    ``"drop"`` (default, the historical behavior) keeps only records both
    clusterings cover (inner join); ``"singleton"`` keeps every record,
    treating a record missing from one side as a singleton cluster there
    (full outer join + a per-record unique label) — the standard
    extension for partial system output, where an unclustered record is
    "its own entity". Under it a record the system skipped scores
    R(e) = 1/|true(e)| (recall debt) and P(e) = 1, and vice versa —
    coverage gaps now show up in the score instead of vanishing.
    Synthetic singleton labels are prefixed with a control character
    (``\\x01``) so they cannot collide with real cluster ids; cluster
    labels are compared as strings.

    Scale shape: never materializes cluster MEMBER PAIRS — three count
    aggregates (per (pred,true) cell, per pred, per true) and one
    weighted sum: Σ_cells n_pt·(n_pt/n_p) / N. All shuffles are keyed on
    cluster ids; a viral cluster costs one count, not |cluster|² rows.
    Singleton mode adds no new shuffle shape: each one-sided record
    becomes a size-1 cell keyed by its own id. round(·, 6) for oracle
    parity.
    """
    if unmatched not in ("drop", "singleton"):
        raise ValueError(
            f"unmatched must be 'drop' or 'singleton', got {unmatched!r}"
        )
    a = pred.select(
        F.col(id_col).alias("_id"), F.col(pred_col).cast("string").alias("_p")
    )
    b = truth.select(
        F.col(id_col).alias("_id"), F.col(true_col).cast("string").alias("_t")
    )
    if unmatched == "singleton":
        joined = (
            a.join(b, "_id", "full_outer")
            .withColumn(
                "_p",
                F.coalesce(
                    F.col("_p"),
                    F.concat(F.lit("\x01solo_p:"), F.col("_id").cast("string")),
                ),
            )
            .withColumn(
                "_t",
                F.coalesce(
                    F.col("_t"),
                    F.concat(F.lit("\x01solo_t:"), F.col("_id").cast("string")),
                ),
            )
        )
    else:
        joined = a.join(b, "_id")
    cells = joined.groupBy("_p", "_t").agg(F.count(F.lit(1)).alias("n_pt"))
    np_ = cells.groupBy("_p").agg(F.sum("n_pt").alias("n_p"))
    nt_ = cells.groupBy("_t").agg(F.sum("n_pt").alias("n_t"))
    agg = (
        cells.join(np_, "_p")
        .join(nt_, "_t")
        .agg(
            F.sum("n_pt").alias("n"),
            F.sum(F.col("n_pt") * F.col("n_pt") / F.col("n_p")).alias("_sp"),
            F.sum(F.col("n_pt") * F.col("n_pt") / F.col("n_t")).alias("_sr"),
        )
    )
    p = F.col("_sp") / F.col("n")
    r = F.col("_sr") / F.col("n")
    return agg.select(
        F.col("n").cast("long").alias("n_records"),
        F.round(p, 6).alias("b3_precision"),
        F.round(r, 6).alias("b3_recall"),
        F.round(
            F.when(p + r > 0, F.lit(2.0) * p * r / (p + r)).otherwise(F.lit(0.0)), 6
        ).alias("b3_f1"),
    )
