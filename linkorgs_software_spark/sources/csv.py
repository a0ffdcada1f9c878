"""CSV/gz ingestion — reference S3 (``BuildHelpers.R:31-69`` ``url2dt``
download+unzip+fread; embeddings csv.gz at ``LinkOrgs_LinkOrgs.R:510-515``).

No downloading here (no external data allowed): the Spark-native analogue is
``spark.read.csv`` with schema enforcement — gzip decompression is implicit
from the file extension, splittability caveat documented below.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv_table(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    *,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """Schema-enforced CSV reader (handles .csv, .csv.gz, .tsv).

    Scale note: a single .gz file is NOT splittable — one task reads it all.
    At 100 TB ingest, land gzip CSVs once, rewrite to parquet/Iceberg via
    this reader + ``df.writeTo``, and never scan the CSV twice (that rewrite
    is what the reference's download-cache emulates).
    """
    reader = (
        spark.read.option("header", str(header).lower())
        .option("sep", delimiter)
        .option("mode", "PERMISSIVE")
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)
