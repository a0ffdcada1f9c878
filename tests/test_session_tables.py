"""session factory config, TableIO parquet fallback, calibration
match-count property (reference test-distance-calculation.R:6-36)."""

import pytest

from linkorgs_software_spark.config import LinkConfig
from linkorgs_software_spark.functions.normalize import prepare_side
from linkorgs_software_spark.operators.blocking import candidate_pairs
from linkorgs_software_spark.operators.calibrate import calibrated_threshold
from linkorgs_software_spark.operators.scoring import score_pairs
from linkorgs_software_spark.sources.fixtures import gen_linkage_fixture
from linkorgs_software_spark.sources.tables import TableIO


def test_session_factory_reuses_active(spark):
    from linkorgs_software_spark.session import build_session

    s = build_session()  # active session exists -> returns it
    assert s is spark
    assert s.conf.get("spark.sql.adaptive.enabled") == "true"


def test_tableio_parquet_fallback(spark, tmp_path):
    tio = TableIO(spark, str(tmp_path / "tables"))
    assert tio.catalog is None
    df = spark.range(10)
    assert not tio.exists("t1")
    tio.write(df, "t1")
    assert tio.exists("t1")
    assert tio.read("t1").count() == 10
    tio.append(df, "t1")
    assert tio.read("t1").count() == 20


def test_calibrated_threshold_yields_expected_match_count(spark):
    """Reference property (test-distance-calculation.R:6-36): with budget k
    matches per row, the number of pairs under the calibrated threshold is
    within [0.5, 1.5] * n * k."""
    n, k = 100, 5
    fx = gen_linkage_fixture(spark, n_entities=n, seed=7)
    cfg = LinkConfig()
    xp = prepare_side(fx["org_x"], "name", "x_id", cfg).cache()
    yp = prepare_side(fx["org_y"], "name", "y_id", cfg).cache()
    thr = calibrated_threshold(xp, yp, cfg, k=float(k))
    # count ALL pairs under the threshold (no blocking, to match the
    # reference's all-pairs calibration semantics)
    from pyspark.sql import functions as F

    from linkorgs_software_spark.functions.qgrams import (
        jaccard_qgram_dist_expr,
        qgram_set_expr,
    )

    xs = xp.select(F.col("name_norm").alias("nx")).distinct()
    ys = yp.select(F.col("name_norm").alias("ny")).distinct()
    cnt = (
        xs.crossJoin(ys)
        .select(
            jaccard_qgram_dist_expr(
                qgram_set_expr("nx", 2), qgram_set_expr("ny", 2)
            ).alias("d")
        )
        .filter(F.col("d") <= thr)
        .count()
    )
    assert 0.5 * n * k <= cnt <= 1.5 * n * k
