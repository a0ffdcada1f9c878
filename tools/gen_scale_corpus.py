"""Deterministic synthetic corpora for the order-of-magnitude scale run.

Generates a documents corpus and an embeddings table at 1x and 10x where
the 1x set is EXACTLY the first tenth of the 10x set (per-row RNG keyed by
global index), so the scale comparison measures corpus GROWTH, not a
distribution change. Same shape as the testdata fixtures: ~54-token zipf
docs with injected boilerplate phrases (drives the span family) and 5%
edited re-posts (drives MinHash; ~10% token edits keep shingle jaccard
above the 0.5 verify threshold), 64-dim unit vectors with 2% perturbed
twins (drives embedding LSH at threshold 0.99).

Usage: python tools/gen_scale_corpus.py  (writes /root/repo/.scale/*)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale")
N_DOCS_10X = 50_000
N_VECS_10X = 50_000
N_NAMES_10X = 20_000
VOCAB = 10_000
DIM = 64

_pool_rng = np.random.RandomState(0)
BOILERPLATE = [
    " ".join(f"w{_pool_rng.randint(0, VOCAB)}" for _ in range(12)) for _ in range(20)
]


def _doc_tokens(i: int, prior_texts: list) -> str:
    rng = np.random.RandomState(1_000_000 + i)
    if i > 0 and rng.rand() < 0.05:
        # edited re-post of an earlier doc: ~10% token replacement
        src = prior_texts[rng.randint(0, i)].split()
        toks = [
            f"w{rng.randint(0, VOCAB)}" if rng.rand() < 0.10 else t for t in src
        ]
        return " ".join(toks)
    n = max(12, int(rng.lognormal(3.9, 0.35)))  # ~54-token center like testdata
    toks = [f"w{min(VOCAB - 1, rng.zipf(1.5) - 1)}" for _ in range(n)]
    if rng.rand() < 0.25:
        phrase = BOILERPLATE[rng.randint(0, len(BOILERPLATE))]
        pos = rng.randint(0, len(toks) + 1)
        toks = toks[:pos] + phrase.split() + toks[pos:]
    return " ".join(toks)


def gen_docs() -> list:
    texts: list = []
    for i in range(N_DOCS_10X):
        texts.append(_doc_tokens(i, texts))
    return texts


def gen_vecs() -> np.ndarray:
    X = np.empty((N_VECS_10X, DIM), dtype=np.float32)
    for i in range(N_VECS_10X):
        rng = np.random.RandomState(2_000_000 + i)
        if i > 0 and rng.rand() < 0.02:
            v = X[rng.randint(0, i)] + rng.normal(scale=1e-3, size=DIM).astype(
                np.float32
            )
        else:
            v = rng.normal(size=DIM).astype(np.float32)
        X[i] = v
    return X


_SUFFIXES = ["corp", "inc", "ltd", "gmbh", "llc", "holdings", "group", "co"]


def gen_names() -> list:
    """Deterministic org-like names for the link_many scale run (per-row
    seeded like the docs, so 1x is exactly the first tenth of 10x)."""
    names = []
    for i in range(N_NAMES_10X):
        rng = np.random.RandomState(3_000_000 + i)
        toks = [f"w{rng.randint(0, VOCAB)}" for _ in range(rng.randint(2, 5))]
        toks.append(_SUFFIXES[rng.randint(0, len(_SUFFIXES))])
        names.append(" ".join(toks))
    return names


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(OUT, exist_ok=True)
    texts = gen_docs()
    X = gen_vecs()
    names = gen_names()
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for frac, tag in ((10, "1x"), (1, "10x")):
        nd, nv, nn = N_DOCS_10X // frac, N_VECS_10X // frac, N_NAMES_10X // frac
        dt = pa.table(
            {
                "doc_id": pa.array(range(nd), pa.int64()),
                "text": pa.array(texts[:nd]),
            }
        )
        vt = pa.table(
            {
                "vec_id": pa.array(range(nv), pa.int64()),
                "embedding": pa.array(list(X[:nv]), pa.list_(pa.float32())),
            }
        )
        nt = pa.table({"name": pa.array(names[:nn])})
        pq.write_table(dt, os.path.join(OUT, f"tmp_docs_{tag}.parquet"))
        pq.write_table(vt, os.path.join(OUT, f"tmp_vecs_{tag}.parquet"))
        pq.write_table(nt, os.path.join(OUT, f"tmp_names_{tag}.parquet"))
        # re-split via Spark: a one-file table reads as ONE input split
        for src, dst in (
            (f"tmp_docs_{tag}", f"documents_{tag}"),
            (f"tmp_vecs_{tag}", f"embeddings_{tag}"),
            (f"tmp_names_{tag}", f"names_{tag}"),
        ):
            spark.read.parquet(os.path.join(OUT, f"{src}.parquet")).repartition(
                32
            ).write.mode("overwrite").parquet(os.path.join(OUT, f"{dst}.parquet"))
            os.remove(os.path.join(OUT, f"{src}.parquet"))
        print(tag, "docs", nd, "vecs", nv, "names", nn)


if __name__ == "__main__":
    main()
