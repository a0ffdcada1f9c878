"""Incremental exact dedup for a streaming document feed.

Training corpora arrive continuously; a new batch must be deduplicated
against EVERYTHING already ingested, not just within itself. foreachBatch
keeps a content-hash history table on disk: each micro-batch
  1. drops its own intra-batch duplicates (keep min id per hash),
  2. anti-joins the accumulated hash history,
  3. appends the surviving docs to ``out_dir/batch_id=N`` (idempotent
     overwrite — replays cannot duplicate) and their hashes to the history.

The history table holds one narrow row (hash, doc_id) per unique document
ever seen — the only state this needs, and the same content-hash key the
batch ``exact_dup_groups`` operator uses, so batch and streaming dedup
agree on what counts as a duplicate.

History appends are idempotent per batch (``history/batch_id=N``
overwrite), so a replayed micro-batch rewrites its own slice of both
outputs instead of double-counting.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def incremental_exact_dedup(
    docs_stream: DataFrame,
    out_dir: str,
    checkpoint_path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    available_now: bool = False,
):
    """Start a streaming query writing only never-seen-before documents.

    ``docs_stream`` needs (id_col, text_col, ...). Kept docs land in
    ``out_dir/docs/batch_id=N``; the hash history in ``out_dir/history``.
    """
    history_dir = os.path.join(out_dir, "history")
    docs_dir = os.path.join(out_dir, "docs")

    def _dedup_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        hashed = batch_df.withColumn("_h", F.md5(F.col(text_col)))
        # intra-batch: keep the min-id doc per hash
        from pyspark.sql import Window

        w = Window.partitionBy("_h")
        hashed = hashed.withColumn("_keep", F.col(id_col) == F.min(id_col).over(w)).filter(
            "_keep"
        )
        # cross-batch: drop anything whose hash is already in history
        try:
            seen = spark.read.parquet(history_dir).select("_h")
            fresh = hashed.join(seen, "_h", "left_anti")
        except Exception:  # first batch: no history yet
            fresh = hashed
        fresh = fresh.persist()
        fresh.drop("_h", "_keep").write.mode("overwrite").parquet(
            f"{docs_dir}/batch_id={batch_id}"
        )
        fresh.select("_h", F.col(id_col)).write.mode("overwrite").parquet(
            f"{history_dir}/batch_id={batch_id}"
        )
        fresh.unpersist()

    writer = (
        docs_stream.writeStream.foreachBatch(_dedup_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:  # drain everything available, then stop (batch-style runs)
        writer = writer.trigger(availableNow=True)
    return writer.start()
