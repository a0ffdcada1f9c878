"""Table I/O abstraction: Iceberg when a catalog is configured, parquet
directories otherwise.

The production design (north rule) stores every stage as an Iceberg table —
snapshot lineage gives resume-from-checkpoint and time travel for free, and
per-partition metrics live beside the snapshot. This sandbox has no Iceberg
runtime jars, so the same API transparently falls back to parquet
directories + the StageCheckpointer's ``_metrics.jsonl``; the call sites do
not change between environments.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _iceberg_catalog(spark: SparkSession) -> str | None:
    """First configured Iceberg catalog name, if any."""
    try:
        confs = spark.sparkContext.getConf().getAll()
    except Exception:  # pragma: no cover - conf access is environment-bound
        return None
    for k, v in confs:
        if k.startswith("spark.sql.catalog.") and k.count(".") == 3 and "Iceberg" in v:
            return k.rsplit(".", 1)[1]
    return None


class TableIO:
    """``write``/``read``/``append`` by table name.

    With an Iceberg catalog: ``<catalog>.<namespace>.<name>`` via
    ``df.writeTo`` (snapshot per stage = lineage + resumability).
    Without: ``<base_dir>/<name>`` parquet.
    """

    def __init__(self, spark: SparkSession, base_dir: str, namespace: str = "linkorgs"):
        self.spark = spark
        self.base_dir = base_dir
        self.namespace = namespace
        self.catalog = _iceberg_catalog(spark)
        if self.catalog is None:
            os.makedirs(base_dir, exist_ok=True)

    def _ident(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{name}"

    def _path(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def write(self, df: DataFrame, name: str) -> None:
        if self.catalog:
            df.writeTo(self._ident(name)).createOrReplace()
        else:
            df.write.mode("overwrite").parquet(self._path(name))

    def append(self, df: DataFrame, name: str) -> None:
        if self.catalog:
            df.writeTo(self._ident(name)).append()
        else:
            df.write.mode("append").parquet(self._path(name))

    def read(self, name: str) -> DataFrame:
        if self.catalog:
            return self.spark.read.table(self._ident(name))
        return self.spark.read.parquet(self._path(name))

    def exists(self, name: str) -> bool:
        if self.catalog:
            return self.spark.catalog.tableExists(self._ident(name))
        return os.path.exists(os.path.join(self._path(name), "_SUCCESS"))
