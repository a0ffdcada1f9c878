"""Blessed SparkSession configuration for the linkage engine.

One place for the scale-relevant knobs so every entry point (tests, bench,
spark-submit jobs) runs with the same physical-execution posture:

* AQE on, including skew-join splitting — hot trigram blocks and
  mega-entity canonical_ids are the expected skew sources (SURVEY.md §4).
* shuffle partitions sized ~2x task slots locally; on a real cluster set
  this (or leave AQE coalescing to shrink it) relative to executor count.
* Arrow enabled with a bounded batch size: scorer UDF memory is
  O(batch x max_name_len) per worker.
* ``maxPartitionBytes`` kept at 128m so 100 TB scans split into ~800k
  tasks rather than a few giant ones; pair it with the checkpointer's
  min-files guard (a one-file stage serializes downstream jobs).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def build_session(
    master: str | None = None,
    *,
    app_name: str = "linkorgs",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "8g",
) -> SparkSession:
    cores = cores or 8
    b = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions or max(cores * 2, 16))
        )
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
    )
    if master:
        b = b.master(master)
    elif not SparkSession.getActiveSession():
        b = b.master(f"local[{cores}]")
    return b.getOrCreate()
