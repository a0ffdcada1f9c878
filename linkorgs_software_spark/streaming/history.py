"""Bucketed on-disk history tables for the streaming near-dup operators.

The scale problem this solves (round-3 audit finding): with the history
stored as plain ``batch_id=N`` parquet directories, every micro-batch's
candidate join SHUFFLES the ever-growing full posting-list table — per-batch
cost grows linearly with corpus lifetime. Here the bucket history is a
catalog table **partitioned by ``batch_id`` and hash-bucketed on the join
key** (the ``sources/io.py run_bucketed`` pattern; Iceberg's bucket
partition transform at prod):

  * the candidate join's history side is an Exchange-free bucketed scan —
    only the (small) micro-batch side shuffles, into ``num_buckets``
    partitions, so per-batch join cost is O(batch + matching buckets), not
    O(history);
  * ``batch_id`` partition pruning gives the same replay-safety rule as
    ``dedup._prior_history_paths`` (a replayed batch never anti-joins its
    own previous attempt) without listing directories;
  * per-batch idempotent overwrite is dynamic partition overwrite on
    ``batch_id`` — a replay rewrites exactly its own partition.

Durability across driver restarts: the default session catalog is
in-memory, so the TABLE METADATA dies with the session while the DATA
(external table under ``out_dir``) survives. Creation therefore writes a
``_table_spec.json`` sidecar (column DDL + bucket spec) next to the data;
``_ensure_table`` re-registers the table from the sidecar and runs ``MSCK
REPAIR`` to recover partitions. A genuinely unreadable sidecar/table fails
the batch (checkpoint retries) rather than being mistaken for "no history
yet" — same error contract as the exact-dedup history.
"""

from __future__ import annotations

import hashlib
import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def history_table_name(out_dir: str, slice_name: str) -> str:
    """Deterministic catalog name derived from the stream's output dir.

    The readable suffix comes from ``re.sub(r'\\W+', '_')``, which is LOSSY
    (``/data/a-b`` and ``/data/a_b`` both sanitize to ``data_a_b``), so an
    md5 digest of the exact absolute path disambiguates: two streams with
    colliding sanitized paths must NOT share one catalog table — the first
    registration's LOCATION would win and the second stream's history reads
    and writes would silently land in the first's directory (wrong
    kept/dropped decisions with no error)."""
    abspath = os.path.abspath(out_dir)
    suffix = re.sub(r"\W+", "_", abspath).strip("_")
    digest = hashlib.md5(abspath.encode("utf-8")).hexdigest()[:8]
    return f"stream_hist_{suffix}_{digest}_{slice_name}"


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def _spec_path(path: str) -> str:
    return os.path.join(path, "_table_spec.json")


def _write_spec(spark: SparkSession, path: str, spec: dict) -> None:
    fs, _, jvm = _fs_and_path(spark, path)
    out = fs.create(jvm.org.apache.hadoop.fs.Path(_spec_path(path)), True)
    try:
        out.write(bytearray(json.dumps(spec).encode("utf-8")))
    finally:
        out.close()


def _read_spec(spark: SparkSession, path: str) -> dict | None:
    fs, _, jvm = _fs_and_path(spark, path)
    p = jvm.org.apache.hadoop.fs.Path(_spec_path(path))
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        # py4j cannot fill a Python buffer in place; commons-io (on Spark's
        # classpath) drains the stream JVM-side and returns the string
        text = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(text)


def _ensure_table(spark: SparkSession, table: str, path: str) -> bool:
    """Re-register ``table`` from its on-disk sidecar if the catalog lost it
    (driver restart with the default in-memory catalog). Returns True when
    the table is registered afterwards, False when there is genuinely no
    history yet. A present-but-unreadable sidecar raises (fail the batch)."""
    if spark.catalog.tableExists(table):
        return True
    spec = _read_spec(spark, path)
    if spec is None:
        return False
    cols = ", ".join(f"{c} {t}" for c, t in spec["columns"])
    bucket_cols = ", ".join(spec["bucket_cols"])
    spark.sql(
        f"CREATE TABLE {table} ({cols}, batch_id INT) USING PARQUET "
        f"PARTITIONED BY (batch_id) CLUSTERED BY ({bucket_cols}) "
        f"SORTED BY ({bucket_cols}) INTO {spec['num_buckets']} BUCKETS "
        f"LOCATION '{path}'"
    )
    spark.sql(f"MSCK REPAIR TABLE {table}")
    return True


def write_history_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    batch_id: int,
    *,
    bucket_cols: tuple[str, ...],
    num_buckets: int = 64,
) -> None:
    """Idempotently (over)write ``df`` as this batch's history slice."""
    spark = df.sparkSession
    stamped = df.withColumn("batch_id", F.lit(int(batch_id)).cast("int"))
    if _ensure_table(spark, table, path):
        # dynamic partition overwrite: a replay rewrites ONLY batch_id=N
        old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            # insertInto matches columns BY POSITION: align to table schema
            stamped.select(*spark.table(table).columns).write.mode(
                "overwrite"
            ).insertInto(table)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
        return
    (
        stamped.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .partitionBy("batch_id")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .saveAsTable(table)
    )
    _write_spec(
        spark,
        path,
        {
            "columns": [[f.name, f.dataType.simpleString()] for f in df.schema.fields],
            "bucket_cols": list(bucket_cols),
            "num_buckets": int(num_buckets),
        },
    )


def read_prior_history(
    spark: SparkSession, table: str, path: str, batch_id: int
) -> DataFrame | None:
    """PRIOR batches' history (``batch_id != N`` — partition pruning), or
    None when no history exists yet. Mirrors ``dedup._prior_history_paths``
    semantics: missing history => first batch; unreadable history raises."""
    if not _ensure_table(spark, table, path):
        return None
    return spark.table(table).filter(F.col("batch_id") != int(batch_id))
