"""A/B: round-4 dedup_passages (head spans RECOMPUTED via a runs ⋈ tokens
join) vs round-5 (head spans CARRIED out of duplicated_span_runs), on the
10x scale corpus. The old shape re-tokenized every doc and shuffled full
token arrays onto the runs frame; this measures what deleting that costs
at volume. Interleaved reps; identical output checksums asserted.

Usage: python tools/ab_dedup_passages.py [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale"
)


def new_impl(spark, docs):
    from pyspark.sql import functions as F

    from linkorgs_software_spark.operators.corpus import dedup_passages

    return dedup_passages(docs, k=8).agg(
        F.sum("n_removed").alias("r"), F.count(F.lit(1)).alias("n")
    ).collect()[0]


def old_impl(spark, docs, k=8):
    """The round-4 formulation, verbatim semantics: recompute each run's
    head window md5 from the doc's own tokens via a runs ⋈ base join."""
    from pyspark.sql import functions as F

    from linkorgs_software_spark.functions.text import tokens_expr
    from linkorgs_software_spark.operators.corpus import duplicated_span_runs

    runs = duplicated_span_runs(docs, k=k).drop("head_span")
    toks = tokens_expr(F.lower(F.col("text")))
    base = docs.select(F.col("doc_id").alias("_id"), toks.alias("_toks"))
    n = F.size("_toks")
    head = runs.select(
        F.col("doc_id").alias("_id"), "start_pos", "end_pos"
    ).join(base, "_id").select(
        "_id",
        "start_pos",
        "end_pos",
        F.md5(
            F.concat_ws(" ", F.slice(F.col("_toks"), F.col("start_pos").cast("int"), k))
        ).alias("_head"),
    )
    keeper = head.groupBy("_head").agg(F.min("_id").alias("_keep_id"))
    cut = (
        head.join(keeper, "_head")
        .filter(F.col("_id") != F.col("_keep_id"))
        .groupBy("_id")
        .agg(F.collect_list(F.struct("start_pos", "end_pos")).alias("_cuts"))
    )
    d = base.join(cut, "_id", "left").withColumn(
        "_cuts",
        F.coalesce(
            "_cuts", F.array().cast("array<struct<start_pos:long,end_pos:long>>")
        ),
    )
    kept = F.filter(
        F.col("_toks"),
        lambda t, i: ~F.exists(
            F.col("_cuts"),
            lambda c: (c["start_pos"] <= i + 1) & (i + 1 < c["end_pos"] + F.lit(k)),
        ),
    )
    out = d.select(
        F.col("_id").alias("doc_id"),
        n.cast("long").alias("n_tokens"),
        (n - F.size(kept)).cast("long").alias("n_removed"),
    )
    return out.agg(
        F.sum("n_removed").alias("r"), F.count(F.lit(1)).alias("n")
    ).collect()[0]


def main() -> None:
    import json

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "32g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SCALE}/documents_10x.parquet")
    res = {"old": [], "new": []}
    checks = set()
    for rep in range(reps):
        for name, fn in (("old", old_impl), ("new", new_impl)):
            t0 = time.time()
            row = fn(spark, docs)
            res[name].append(round(time.time() - t0, 2))
            checks.add((int(row["r"]), int(row["n"])))
    assert len(checks) == 1, checks  # identical removed-token totals
    import statistics

    print(
        json.dumps(
            {
                "all_sec": res,
                "median": {k: statistics.median(v) for k, v in res.items()},
                "checksum": list(checks)[0],
            }
        )
    )


if __name__ == "__main__":
    main()
