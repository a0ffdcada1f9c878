"""Capture the streaming resolver's create-path scoring plan, before/after.

The resolver's scoring frames are internal to ``_resolve_batch_inner``, so
the declared-query plan capture can't show them. This tool rebuilds the
create-path `scored` frame on the bench fixture in BOTH formulations —
the round-start form (per-pair ``distance_expr("jaccard")`` over joined
name strings) and the current form (pre-computed packed q-gram sets +
``jaccard_dist_from_sizes_expr``) — and writes their
``explain("formatted")`` to ``plans/r07/resolve_scored_{before,after}.txt``.
Both formulations are asserted row- and value-identical first.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from bench import _session
    from pyspark.sql import functions as F

    spark = _session(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")

    from linkorgs_software_spark.config import DEFAULT
    from linkorgs_software_spark.functions.normalize import NORM_COL, prepare_side
    from linkorgs_software_spark.functions.qgrams import (
        jaccard_dist_from_sizes_expr,
        packed_qgram_set_expr,
    )
    from linkorgs_software_spark.functions.scorers import distance_expr
    from linkorgs_software_spark.operators.blocking import gram_index
    from linkorgs_software_spark.sources.fixtures import gen_linkage_fixture

    cfg = DEFAULT
    fx = gen_linkage_fixture(spark, n_entities=1500, seed=42)
    prep = prepare_side(fx["org_x"].select("name"), "name", "_rid", cfg)
    names = prep.select(NORM_COL, F.col("_rid").alias("_nid")).distinct().persist()
    tri = gram_index(names, "_nid", cfg).persist()
    ntri = tri.groupBy("_nid").agg(F.count(F.lit(1)).alias("_n_grams"))
    cand = (
        tri.select(F.col("_nid").alias("x_id"), "gram")
        .join(tri.select(F.col("_nid").alias("y_id"), "gram"), "gram")
        .filter(F.col("x_id") < F.col("y_id"))
        .groupBy("x_id", "y_id")
        .agg(F.count(F.lit(1)).alias("_shared"))
        .join(ntri.select(F.col("_nid").alias("x_id"), "_n_grams"), "x_id")
        .filter(
            F.col("_shared")
            >= F.ceil(F.lit(float(cfg.min_shared_frac)) * F.col("_n_grams"))
        )
        .persist()
    )
    before = (
        cand.join(
            names.select(F.col("_nid").alias("x_id"), F.col(NORM_COL).alias("_nx")),
            "x_id",
        )
        .join(
            names.select(F.col("_nid").alias("y_id"), F.col(NORM_COL).alias("_ny")),
            "y_id",
        )
        .select(
            "x_id",
            "y_id",
            distance_expr("jaccard", "_nx", "_ny", qgram=cfg.qgram).alias(
                "stringdist"
            ),
        )
    )
    names_g = (
        names.select("_nid", packed_qgram_set_expr(NORM_COL, cfg.qgram).alias("_gset"))
        .withColumn("_gsz", F.size("_gset"))
        .persist()
    )
    after = (
        cand.join(
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
    )
    mismatch = (
        before.withColumnRenamed("stringdist", "d1")
        .join(after.withColumnRenamed("stringdist", "d2"), ["x_id", "y_id"])
        .filter(F.abs(F.col("d1") - F.col("d2")) > 1e-12)
        .count()
    )
    print(f"pairs={cand.count()} value mismatches={mismatch}")
    assert mismatch == 0
    outdir = "plans/r07"
    os.makedirs(outdir, exist_ok=True)
    for name, df in (("before", before), ("after", after)):
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"resolve_scored_{name}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
