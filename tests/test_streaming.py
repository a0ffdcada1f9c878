"""Structured Streaming smoke: incremental linkage over a file-source
transcript stream via foreachBatch (streaming/incremental.py)."""

import os

import pytest
from pyspark.sql import functions as F

from linkorgs_software_spark.config import LinkConfig
from linkorgs_software_spark.sources.fixtures import (
    TRANSCRIPT_SCHEMA,
    gen_linkage_fixture,
    gen_transcripts,
)
from linkorgs_software_spark.streaming import incremental_link


def test_incremental_link_file_stream(spark, tmp_path):
    fx = gen_linkage_fixture(spark, n_entities=15, seed=42)
    names = [r.name for r in fx["org_x"].collect()]
    tr = gen_transcripts(spark, n_conversations=12, seed=42, org_names=names)

    src = str(tmp_path / "stream_src")
    sink = str(tmp_path / "stream_sink")
    ckpt = str(tmp_path / "stream_ckpt")
    tr.write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .parquet(src)
    )
    cfg = LinkConfig(by_x="name", by_y="name")
    q = incremental_link(stream, fx["org_x"], sink, ckpt, cfg, max_dist=0.3)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    out = spark.read.parquet(sink)
    assert out.count() > 0
    # linked mentions are verbatim org names at max_dist 0.3 -> exact pairs
    assert out.filter(F.col("minDist") > 0.3).count() == 0
