"""plans.transcripts: the driver input_hint path (transcripts -> linkage),
CSV source roundtrip, top-k dedup extension."""

import pytest
from pyspark.sql import functions as F

from linkorgs_software_spark.config import LinkConfig, fixed_threshold_config
from linkorgs_software_spark.operators.dedup import keep_top_k_per_group
from linkorgs_software_spark.plans.transcripts import link_transcript_mentions
from linkorgs_software_spark.sources.csv import read_csv_table
from linkorgs_software_spark.sources.fixtures import gen_linkage_fixture, gen_transcripts


def test_link_transcript_mentions_end_to_end(spark):
    fx = gen_linkage_fixture(spark, n_entities=20, seed=42)
    org_names = [r.name for r in fx["org_x"].collect()]
    tr = gen_transcripts(spark, n_conversations=25, seed=42, org_names=org_names)
    out = link_transcript_mentions(
        tr, fx["org_x"], fixed_threshold_config(max_dist=0.3), one_to_one=True
    )
    rows = out.collect()
    assert len(rows) > 0
    # every linked mention carries provenance and an exact/near-exact match
    for r in rows:
        assert r.conv_id.startswith("conv")
        assert r.turn_idx >= 0
        assert r.minDist <= 0.3
    # mentions are verbatim org_x names -> name_y must equal the mention name
    exact = [r for r in rows if r.name_x == r.name_y]
    assert len(exact) == len(rows)


def test_provenance_survives_raw_variant_mentions(spark):
    """Mentions that differ only by case/punctuation collapse to one x_id in
    link_orgs; every raw occurrence must still keep its matched row (the
    provenance join runs on the normalized mention, not the raw string)."""
    import datetime as dt

    rows = [
        ("conv1", 0, "user", "ping [[Acme Corp]] for status", "t", dt.datetime(2026, 1, 1)),
        ("conv1", 1, "agent", "ok, [[acme corp]] notified", "t", dt.datetime(2026, 1, 1)),
        ("conv2", 0, "user", "escalate to [[ACME, CORP.]] now", "t", dt.datetime(2026, 1, 2)),
    ]
    tr = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    ref = spark.createDataFrame([(1, "acme corp")], "id long, name string")
    out = link_transcript_mentions(
        tr, ref, fixed_threshold_config(max_dist=0.1), one_to_one=False
    )
    prov = {(r.conv_id, r.turn_idx) for r in out.collect()}
    assert prov == {("conv1", 0), ("conv1", 1), ("conv2", 0)}
    # diagnostics stay hidden on the provenance surface
    assert "name_norm_x" not in out.columns and "x_id" not in out.columns


def test_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "acme corp"), (2, "globex, llc")], "id long, name string"
    )
    path = str(tmp_path / "orgs_csv")
    df.write.mode("overwrite").option("header", "true").csv(path)
    back = read_csv_table(spark, path, schema="id long, name string")
    assert {(r.id, r.name) for r in back.collect()} == {
        (1, "acme corp"),
        (2, "globex, llc"),
    }


def test_keep_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("a", 1, 0.1), ("a", 2, 0.2), ("a", 3, 0.3), ("b", 4, 0.9)],
        "g string, id long, d double",
    )
    out = keep_top_k_per_group(df, ["g"], "d", k=2, tiebreak_cols=["id"])
    got = {(r.g, r.id) for r in out.collect()}
    assert got == {("a", 1), ("a", 2), ("b", 4)}
