"""Resumable pipeline: link_orgs with a StageCheckpointer skips completed
stages on re-run (north rule: resume from checkpoint with metrics)."""

from linkorgs_software_spark.config import LinkConfig, fixed_threshold_config
from linkorgs_software_spark.plans.pipeline import link_orgs
from linkorgs_software_spark.sources.fixtures import gen_linkage_fixture
from linkorgs_software_spark.sources.io import StageCheckpointer


def test_link_orgs_resumes_from_checkpoints(spark, tmp_path, fixture_tables):
    cfg = fixed_threshold_config(max_dist=0.5, max_dist_network=0.3)
    ckpt = StageCheckpointer(spark, str(tmp_path / "stages"))

    z1 = link_orgs(
        fixture_tables["org_x"],
        fixture_tables["org_y"],
        cfg,
        algorithm="alias",
        directory=fixture_tables["alias_directory"],
        checkpointer=ckpt,
    )
    n1 = z1.count()
    stages = {m["stage"] for m in ckpt.metrics()}
    assert {"scored_raw", "x2net", "y2net", "z_final"} <= stages
    assert all(m["rows"] >= 0 for m in ckpt.metrics())

    # re-run: all stages complete -> no new metrics entries, same output
    n_metrics_before = len(ckpt.metrics())
    z2 = link_orgs(
        fixture_tables["org_x"],
        fixture_tables["org_y"],
        cfg,
        algorithm="alias",
        directory=fixture_tables["alias_directory"],
        checkpointer=ckpt,
    )
    assert z2.count() == n1
    assert len(ckpt.metrics()) == n_metrics_before


def test_checkpointed_equals_uncheckpointed(spark, tmp_path, fixture_tables):
    cfg = fixed_threshold_config(max_dist=0.5)
    ckpt = StageCheckpointer(spark, str(tmp_path / "stages2"))
    plain = link_orgs(fixture_tables["org_x"], fixture_tables["org_y"], cfg)
    ck = link_orgs(
        fixture_tables["org_x"], fixture_tables["org_y"], cfg, checkpointer=ckpt
    )
    a = sorted((r.name_x, r.name_y, round(r.minDist, 9)) for r in plain.collect())
    b = sorted((r.name_x, r.name_y, round(r.minDist, 9)) for r in ck.collect())
    assert a == b
