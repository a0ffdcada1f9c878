"""Order-of-magnitude scale run (round-5 VERDICT task 6): the dedup family
at 1x (5k docs / 5k vecs) and 10x (50k / 50k) on the deterministic
`gen_scale_corpus` fixtures, interleaved reps so slow load drift hits both
sizes equally. Prints one JSON line with per-query seconds + counts at
both sizes and the 10x/1x time ratio (~10 = linear; ~100 = a quadratic
blowup the df-caps were supposed to prevent).

Usage: python tools/gen_scale_corpus.py && python tools/scale_run.py [reps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale"
)


def q_minhash(spark, tag):
    from linkorgs_software_spark.operators.corpus import minhash_lsh_dups

    docs = spark.read.parquet(f"{SCALE}/documents_{tag}.parquet")
    return minhash_lsh_dups(docs, threshold=0.5).count()


def q_embedding_lsh(spark, tag):
    from linkorgs_software_spark.operators.corpus import embedding_neardup_lsh

    emb = spark.read.parquet(f"{SCALE}/embeddings_{tag}.parquet")
    return embedding_neardup_lsh(emb, threshold=0.99, num_tables=4).count()


def q_dup_spans(spark, tag):
    from pyspark.sql import functions as F

    from linkorgs_software_spark.operators.corpus import duplicated_spans

    docs = spark.read.parquet(f"{SCALE}/documents_{tag}.parquet")
    return int(
        duplicated_spans(docs, k=8).agg(F.sum("n_dup_spans")).collect()[0][0]
    )


def q_dedup_passages(spark, tag):
    from pyspark.sql import functions as F

    from linkorgs_software_spark.operators.corpus import dedup_passages

    docs = spark.read.parquet(f"{SCALE}/documents_{tag}.parquet")
    return int(dedup_passages(docs, k=8).agg(F.sum("n_removed")).collect()[0][0])


def q_tfidf(spark, tag):
    from pyspark.sql import functions as F

    from linkorgs_software_spark.operators.corpus import tfidf_top_terms

    docs = spark.read.parquet(f"{SCALE}/documents_{tag}.parquet")
    return tfidf_top_terms(docs, k=3).count()


def q_lm_quality(spark, tag):
    from pyspark.sql import functions as F

    from linkorgs_software_spark.operators.corpus import lm_quality_scores

    docs = spark.read.parquet(f"{SCALE}/documents_{tag}.parquet")
    return int(
        lm_quality_scores(docs).agg(F.sum("n_bigrams")).collect()[0][0]
    )


def q_decontaminate(spark, tag):
    from pyspark.sql import functions as F

    from linkorgs_software_spark.operators.corpus import decontaminate_flags

    docs = spark.read.parquet(f"{SCALE}/documents_{tag}.parquet")
    out = decontaminate_flags(
        docs.filter(F.col("doc_id") % 50 != 0),
        docs.filter(F.col("doc_id") % 50 == 0),
        k=8,
    )
    return int(out.agg(F.sum("n_contaminated_windows")).collect()[0][0])


QUERIES = {
    "minhash_lsh_dedup": q_minhash,
    "embedding_lsh_dedup": q_embedding_lsh,
    "dup_spans": q_dup_spans,
    "dedup_passages": q_dedup_passages,
    "tfidf_top_terms": q_tfidf,
    "lm_quality": q_lm_quality,
    "decontaminate": q_decontaminate,
}


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    global QUERIES
    names = [a for a in sys.argv[2:] if a in QUERIES]
    if names:
        QUERIES = {n: QUERIES[n] for n in names}
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "32g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    secs: dict = {}
    counts: dict = {}
    for rep in range(reps):
        for name, fn in QUERIES.items():
            for tag in ("1x", "10x"):
                t0 = time.time()
                c = fn(spark, tag)
                dt = time.time() - t0
                key = f"{name}_{tag}"
                secs.setdefault(key, []).append(round(dt, 2))
                counts[key] = c
    best = {k: min(v) for k, v in secs.items()}
    ratios = {
        name: round(best[f"{name}_10x"] / best[f"{name}_1x"], 2)
        for name in QUERIES
    }
    print(
        json.dumps(
            {
                "best_sec": best,
                "all_sec": secs,
                "counts": counts,
                "time_ratio_10x_over_1x": ratios,
            }
        )
    )


if __name__ == "__main__":
    main()
