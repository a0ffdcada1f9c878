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


def recommended_history_buckets(
    batch_df: DataFrame, *, target_bytes: int = 16 * 1024 * 1024,
    lo: int = 8, hi: int = 4096,
) -> int:
    """Bucket count derived from the micro-batch's estimated size — the
    scale-adaptive default for the streaming history tables.

    A FIXED bucket count is wrong at both ends: 64 buckets over a small
    local stream writes 64 near-empty files per batch per slice (measured
    round 7: the 4-batch near-dup bench spent 3.6x its compute time on
    small-file and bucket-commit overhead, 72.6s at 64 buckets vs 20.2s
    at 8, identical results), while 64 buckets over a 100 TB/day feed
    caps the Exchange-free history join's scan parallelism at 64 tasks
    forever. The rule sizes buckets so a batch's slice lands near
    ``target_bytes`` per file, clamped to [lo, hi]; the estimate comes
    from the batch frame's optimizer statistics (file-source sizes — no
    action, no ``.rdd``). Only the FIRST batch resolves this: after the
    table exists, inserts follow the on-disk bucket spec. Streams whose
    batch volume will grow far past the bootstrap batch should pass an
    explicit production count instead.
    """
    try:
        raw = (
            batch_df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        size = int(raw if isinstance(raw, int) else raw.toString())
    except Exception:
        return lo
    # a source with no statistics (in-memory frames, some streaming
    # sources) reports Spark's defaultSizeInBytes sentinel (~2^63); any
    # such absurd estimate means UNKNOWN, not huge — fall back to ``lo``
    # and let production streams pass an explicit count
    if size <= 0 or size >= 1 << 50:
        return lo
    return max(lo, min(hi, (size + target_bytes - 1) // target_bytes))


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


def list_batch_ids(spark: SparkSession, path: str) -> list[int]:
    """Batch ids present as ``batch_id=N`` directories under ``path``
    (negative ids are compaction snapshots). Missing dir => []."""
    fs, hpath, _ = _fs_and_path(spark, path)
    if not fs.exists(hpath):
        return []
    out = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("batch_id="):
            try:
                out.append(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    return sorted(out)


def _fold_set(
    ids: list[int], watermark: int, *, which: str = "all"
) -> tuple[list[int], int]:
    """Partitions eligible for folding and the next snapshot id.

    ``which``: ``"all"`` = prior snapshots + committed real batches
    (< ``watermark``); ``"reals"`` = committed real batches only (a
    tier-1 fold that leaves existing snapshots untouched); ``"snaps"`` =
    snapshots only (the tier-2 merge).

    Snapshot ids are MONOTONE NEGATIVE (-1, -2, ...): each compaction
    writes a brand-new snapshot partition and only then deletes what it
    folded, so a crash at any point leaves at worst DUPLICATE history rows
    (benign for dedup — candidate pairs are distinct'd and anti-joins are
    membership tests), never missing history. A mutable single snapshot
    dir would instead have a delete-then-rename window that silently LOSES
    prior history."""
    snaps = [b for b in ids if b < 0]
    olds = [b for b in ids if 0 <= b < watermark]
    fold = {"all": snaps + olds, "reals": olds, "snaps": snaps}[which]
    new_id = min(snaps, default=0) - 1
    return fold, new_id


def compact_plain_history(
    spark: SparkSession, path: str, *, watermark: int, which: str = "all",
    transform=None, min_fold: int = 2
) -> int | None:
    """Fold a plain-parquet history's old ``batch_id`` partitions (prior
    snapshots + real batches < ``watermark``) into one new snapshot
    partition. Returns the new snapshot id, or None when there is nothing
    to fold (fewer than ``min_fold`` eligible partitions).

    ``transform`` (optional, DataFrame -> DataFrame) is applied to the
    folded union before the snapshot write — the hook the directory-merge
    compaction uses to rewrite entity ids while folding (a pure fold plus
    a separate rewrite would pay the write twice). ``min_fold=1`` lets a
    transforming fold rewrite even a single slice; the default 2 keeps
    the pure fold a no-op when there is nothing to merge. The transform
    MUST NOT lazily reference the partitions being folded through frames
    other than the one it is given (they are deleted after the rename).

    Replay safety: a replayed batch N excludes only ``batch_id == N``, and
    only batches STRICTLY below the caller's watermark (committed batches
    that can never replay — foreachBatch ids are monotone and only the last
    uncommitted batch re-executes) are folded, so a snapshot can never
    absorb a partition that a replay would need to exclude."""
    ids = list_batch_ids(spark, path)
    fold, new_id = _fold_set(ids, watermark, which=which)
    if len(fold) < max(min_fold, 1):
        return None
    fs, _, jvm = _fs_and_path(spark, path)
    dirs = [os.path.join(path, f"batch_id={b}") for b in fold]
    tmp = path.rstrip("/") + "__compact_tmp"
    folded = spark.read.parquet(*dirs)
    if transform is not None:
        folded = transform(folded)
    folded.write.mode("overwrite").parquet(tmp)
    # rename INTO the partition namespace only after the tmp write committed
    fs.rename(
        jvm.org.apache.hadoop.fs.Path(tmp),
        jvm.org.apache.hadoop.fs.Path(os.path.join(path, f"batch_id={new_id}")),
    )
    for d in dirs:
        fs.delete(jvm.org.apache.hadoop.fs.Path(d), True)
    return new_id


def compact_bucketed_history(
    spark: SparkSession, table: str, path: str, *, watermark: int, which: str = "all"
) -> int | None:
    """Fold the bucketed catalog history's old partitions into one new
    snapshot partition with the SAME bucket spec (written through the
    normal ``write_history_bucketed`` insert, so the Exchange-free history
    join and ``MSCK`` recovery behave identically on compacted history —
    recovery cost drops from O(batches) to O(compacted partitions)).

    This is the parquet/metastore analogue of Iceberg's
    ``rewrite_data_files``: without it a year-long stream accumulates
    O(batches · num_buckets) files and every micro-batch's history scan
    pays that metadata cost. Crash anywhere => at worst duplicate rows
    (see ``_fold_set``), cleaned up by the next compaction."""
    ids = list_batch_ids(spark, path)
    fold, new_id = _fold_set(ids, watermark, which=which)
    if len(fold) <= 1:
        return None
    if not _ensure_table(spark, table, path):
        return None
    spec = _read_spec(spark, path)
    if spec is None:
        return None
    data_cols = [c for c, _ in spec["columns"]]
    tmp = path.rstrip("/") + "__compact_tmp"
    fs, _, jvm = _fs_and_path(spark, path)
    try:
        # materialize OUTSIDE the table location first: Spark refuses to
        # overwrite a table it is simultaneously reading, and the tmp copy
        # also makes the fold atomic-in-effect (insert only after commit)
        (
            spark.table(table)
            .filter(F.col("batch_id").isin([int(b) for b in fold]))
            .select(*data_cols)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        write_history_bucketed(
            spark.read.parquet(tmp),
            table,
            path,
            new_id,
            bucket_cols=tuple(spec["bucket_cols"]),
            num_buckets=int(spec["num_buckets"]),
        )
        for b in fold:
            spark.sql(
                f"ALTER TABLE {table} DROP IF EXISTS PARTITION (batch_id={int(b)})"
            )
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(os.path.join(path, f"batch_id={b}")),
                True,
            )
    finally:
        fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
    return new_id


def maybe_compact(
    spark: SparkSession,
    *,
    watermark: int,
    every: int,
    bucketed: tuple[str, str] | None = None,
    plain_paths: tuple[str, ...] = (),
) -> bool:
    """TIERED compaction trigger, probed with one FS listing per batch
    (cheap enough to run every micro-batch). ``bucketed`` is the
    (table, path) of the catalog history; ``plain_paths`` are its lockstep
    plain-parquet slices (shingles / embeddings / hash history).

    Two tiers bound the REWRITE amortization as well as the metadata:

      * tier 1 — when ``every`` committed real batches accumulate, fold
        ONLY those batches into a new snapshot (existing snapshots are
        left untouched), so each tier-1 fold rewrites O(every) batches of
        data, never the whole history;
      * tier 2 — when ``every`` snapshots accumulate, fold the snapshots
        into one. Tier-2 folds DO rewrite accumulated history, but they
        fire every ``every``² batches instead of every ``every``.

    Amortized extra write per batch: O(1 batch) + O(history / every²),
    vs O(history / every) for the naive fold-everything-each-time scheme
    — the two-level LSM/Iceberg binpack idea. Partition count stays
    bounded at < 2·``every`` + 1 (reals awaiting tier 1 + snapshots
    awaiting tier 2). Replay safety is per-fold (see
    ``compact_plain_history``) and unaffected by tiering: snapshots only
    ever contain committed batches."""
    every = max(2, int(every))  # a 1-batch "fold" is a pointless rewrite
    if bucketed is None and not plain_paths:
        raise ValueError(
            "maybe_compact needs a bucketed (table, path) and/or plain_paths"
        )
    # The FIRST slice (the bucketed path, else plain_paths[0]) is the
    # trigger probe; folds then apply to ALL slices, each of which re-lists
    # its own partitions — slices are written in lockstep per batch, so one
    # probe listing decides for all of them.
    probe = bucketed[1] if bucketed is not None else plain_paths[0]
    ids = list_batch_ids(spark, probe)
    olds = [b for b in ids if 0 <= b < watermark]
    snaps = [b for b in ids if b < 0]
    folds = []
    if len(olds) >= every:
        folds.append("reals")
        if len(snaps) + 1 >= every:  # the tier-1 fold adds one snapshot
            folds.append("snaps")
    elif len(snaps) >= every:
        folds.append("snaps")
    for which in folds:
        if bucketed is not None:
            compact_bucketed_history(
                spark, bucketed[0], bucketed[1], watermark=watermark, which=which
            )
        for p in plain_paths:
            compact_plain_history(spark, p, watermark=watermark, which=which)
    return bool(folds)


def read_prior_history(
    spark: SparkSession, table: str, path: str, batch_id: int
) -> DataFrame | None:
    """PRIOR batches' history (``batch_id != N`` — partition pruning), or
    None when no history exists yet. Mirrors ``dedup._prior_history_paths``
    semantics: missing history => first batch; unreadable history raises."""
    if not _ensure_table(spark, table, path):
        return None
    return spark.table(table).filter(F.col("batch_id") != int(batch_id))
