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

Replay safety: a re-executed micro-batch N must produce the same output as
its first attempt. The history read therefore enumerates only PRIOR batch
partitions (``batch_id != N``) — if it read the whole history dir, a replay
would anti-join against its own previous attempt's hashes, drop every doc,
and overwrite ``docs/batch_id=N`` with an empty frame (silent data loss).
Partition enumeration uses the Hadoop FileSystem API so the same code works
on HDFS/S3 at scale; a genuinely unreadable history (corrupt file,
permissions) FAILS the batch so the checkpoint retries it, instead of being
mistaken for "no history yet" and admitting duplicates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _prior_history_paths(spark: SparkSession, history_dir: str, batch_id: int) -> list:
    """Hadoop-FS listing of ``history_dir``'s batch partitions, excluding the
    current batch (whose directory may exist from a failed prior attempt).

    Missing history dir => [] (genuinely the first batch). Any other listing
    failure propagates — treating a transient FS error as "first batch" would
    silently disable cross-batch dedup for this batch.
    """
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(history_dir)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(path):
        return []
    current = f"batch_id={batch_id}"
    out = []
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("batch_id=") and name != current:
            out.append(st.getPath().toString())
    return out


def dedup_batch(
    batch_df: DataFrame,
    batch_id: int,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_every: int | None = None,
) -> None:
    """Process one micro-batch: intra-batch dedup, anti-join prior history,
    idempotent overwrite of this batch's docs + history slices.

    Public (not just a closure) so replay behaviour is directly testable.

    ``compact_every`` folds committed hash-history partitions older than
    this batch into one snapshot partition once that many accumulate
    (``history.compact_plain_history``) — bounds directory/file count at
    O(compact_every) over the stream's lifetime.
    """
    history_dir = os.path.join(out_dir, "history")
    docs_dir = os.path.join(out_dir, "docs")
    spark = batch_df.sparkSession
    if compact_every is not None:
        from .history import maybe_compact

        maybe_compact(
            spark,
            watermark=batch_id,
            every=compact_every,
            plain_paths=(history_dir,),
        )
    hashed = batch_df.withColumn("_h", F.md5(F.col(text_col)))
    # intra-batch: keep the min-id doc per hash
    w = Window.partitionBy("_h")
    hashed = hashed.withColumn("_keep", F.col(id_col) == F.min(id_col).over(w)).filter(
        "_keep"
    )
    # cross-batch: drop anything whose hash is already in PRIOR history
    prior = _prior_history_paths(spark, history_dir, batch_id)
    if prior:
        seen = spark.read.parquet(*prior).select("_h")
        fresh = hashed.join(seen, "_h", "left_anti")
    else:
        fresh = hashed
    fresh = fresh.persist()
    try:
        fresh.drop("_h", "_keep").write.mode("overwrite").parquet(
            f"{docs_dir}/batch_id={batch_id}"
        )
        fresh.select("_h", F.col(id_col)).write.mode("overwrite").parquet(
            f"{history_dir}/batch_id={batch_id}"
        )
    finally:
        fresh.unpersist()


def incremental_exact_dedup(
    docs_stream: DataFrame,
    out_dir: str,
    checkpoint_path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_every: int | None = None,
    available_now: bool = False,
):
    """Start a streaming query writing only never-seen-before documents.

    ``docs_stream`` needs (id_col, text_col, ...). Kept docs land in
    ``out_dir/docs/batch_id=N``; the hash history in ``out_dir/history``.
    """

    def _dedup_batch(batch_df: DataFrame, batch_id: int) -> None:
        dedup_batch(
            batch_df,
            batch_id,
            out_dir,
            id_col=id_col,
            text_col=text_col,
            compact_every=compact_every,
        )

    writer = (
        docs_stream.writeStream.foreachBatch(_dedup_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:  # drain everything available, then stop (batch-style runs)
        writer = writer.trigger(availableNow=True)
    return writer.start()
