"""Connected components + evaluation arithmetic — mirrors reference
test-assessment.R (SURVEY.md §5) and the clustering step of §3.2."""

import pytest

from linkorgs_software_spark import (
    assess_match_performance,
    clusters_to_pairs,
    connected_components,
)


def test_cc_basic_components(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (5, 5)], "src long, dst long"
    )
    cc = {r.id: r.component for r in connected_components(edges).collect()}
    assert cc[1] == cc[2] == cc[3] == 1
    assert cc[10] == cc[11] == 10
    assert cc[5] == 5


def test_cc_long_chain(spark):
    n = 20
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )
    cc = {r.id: r.component for r in connected_components(edges).collect()}
    assert set(cc.values()) == {0}
    assert len(cc) == n + 1


def test_cc_100_node_path_converges_in_log_rounds(spark):
    """Pointer jumping must converge a diameter-99 path well inside a
    logarithmic round budget (one-hop propagation alone would need ~99)."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(99)], "src long, dst long"
    )
    cc = {r.id: r.component for r in connected_components(edges, max_iter=12).collect()}
    assert set(cc.values()) == {0}
    assert len(cc) == 100


def test_cc_deterministic_min_label(spark):
    edges = spark.createDataFrame([(7, 3), (3, 9), (9, 1)], "src long, dst long")
    cc = {r.id: r.component for r in connected_components(edges).collect()}
    assert set(cc.values()) == {1}


def test_clusters_to_pairs(spark):
    assign = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (9, 9)], "id long, component long"
    )
    pairs = {(r.id_a, r.id_b) for r in clusters_to_pairs(assign).collect()}
    assert pairs == {(1, 2), (1, 3), (2, 3)}


def _pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, "name_x string, name_y string")


def test_assess_perfect(spark):
    # reference: test-assessment.R perfect case
    z = _pairs_df(spark, [("a", "a1"), ("b", "b1")])
    a = assess_match_performance(z, z, n_x=2, n_y=2)
    assert (a.tp, a.fp, a.fn, a.tn) == (2, 0, 0, 2)
    assert a.f1 == 1.0


def test_assess_all_wrong(spark):
    z = _pairs_df(spark, [("a", "b1"), ("b", "a1")])
    t = _pairs_df(spark, [("a", "a1"), ("b", "b1")])
    a = assess_match_performance(z, t, n_x=2, n_y=2)
    assert (a.tp, a.fp, a.fn) == (0, 2, 2)
    assert a.f1 == 0.0


def test_assess_partial(spark):
    z = _pairs_df(spark, [("a", "a1"), ("b", "WRONG")])
    t = _pairs_df(spark, [("a", "a1"), ("b", "b1")])
    a = assess_match_performance(z, t, n_x=2, n_y=3)
    assert (a.tp, a.fp, a.fn) == (1, 1, 1)
    assert a.tn == 2 * 3 - 3
    assert a.precision == 0.5 and a.recall == 0.5


def test_assess_empty_prediction(spark):
    z = _pairs_df(spark, [])
    t = _pairs_df(spark, [("a", "a1")])
    a = assess_match_performance(z, t, n_x=1, n_y=1)
    assert (a.tp, a.fp, a.fn, a.tn) == (0, 0, 1, 0)
    assert a.f1 == 0.0


def test_assess_duplicate_pairs_deduped(spark):
    # reference dedups pair sets before counting (AssessMatches.R:73-76)
    z = _pairs_df(spark, [("a", "a1"), ("a", "a1"), ("a", "a1")])
    t = _pairs_df(spark, [("a", "a1")])
    a = assess_match_performance(z, t, n_x=1, n_y=1)
    assert (a.tp, a.fp, a.fn, a.tn) == (1, 0, 0, 0)


def test_assess_blocking_metrics(spark):
    """Pairs completeness = covered truth fraction; reduction ratio =
    eliminated share of the nx*ny comparison space."""
    from linkorgs_software_spark.operators.assess import assess_blocking

    cand = spark.createDataFrame(
        [("a", "a1"), ("a", "b1"), ("b", "b1"), ("b", "b1")],  # dup collapses
        "name_x string, name_y string",
    )
    truth = spark.createDataFrame(
        [("a", "a1"), ("b", "b1"), ("c", "c1")], "name_x string, name_y string"
    )
    r = assess_blocking(cand, truth, n_x=10, n_y=10).collect()[0]
    assert r.n_candidates == 3
    assert r.n_truth == 3
    assert r.n_covered == 2  # (c, c1) was lost by blocking
    assert r.pairs_completeness == pytest.approx(2 / 3, abs=1e-6)
    assert r.reduction_ratio == pytest.approx(1 - 3 / 100, abs=1e-6)


def test_b3_scores_hand_checked(spark):
    """Worked example: truth {1,2,3}{4,5}; pred splits the first cluster
    -> perfect precision, recall < 1; exact fractions hand-derived."""
    from linkorgs_software_spark.operators.assess import b3_scores

    truth = spark.createDataFrame(
        [(i, "A") for i in (1, 2, 3)] + [(i, "B") for i in (4, 5)],
        "id long, true_cluster string",
    )
    pred = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y"), (4, "z"), (5, "z")],
        "id long, pred_cluster string",
    )
    row = b3_scores(pred, truth).collect()[0]
    assert row.n_records == 5
    # precision: every pred cluster is pure -> 1.0
    assert row.b3_precision == 1.0
    # recall per record: 1,2 -> 2/3; 3 -> 1/3; 4,5 -> 1  => (2*2/3 + 1/3 + 2)/5
    expect_r = round((2 * (2 / 3) + 1 / 3 + 2.0) / 5.0, 6)
    assert row.b3_recall == expect_r
    pr = 1.0 * (expect_r) ; # f1 from rounded? computed pre-round:
    import math
    r = (2 * (2 / 3) + 1 / 3 + 2.0) / 5.0
    assert row.b3_f1 == round(2 * 1.0 * r / (1.0 + r), 6)


def test_b3_identical_clusterings_score_one(spark):
    from linkorgs_software_spark.operators.assess import b3_scores

    assign = spark.createDataFrame(
        [(i, f"c{i % 3}") for i in range(30)], "id long, pred_cluster string"
    )
    truth = assign.selectExpr("id", "pred_cluster as true_cluster")
    row = b3_scores(assign, truth).collect()[0]
    assert (row.b3_precision, row.b3_recall, row.b3_f1) == (1.0, 1.0, 1.0)


def test_b3_merged_everything_has_low_precision(spark):
    """Predicting ONE giant cluster: recall 1, precision = avg true-cluster
    share — the failure mode pairwise F1 under-penalizes."""
    from linkorgs_software_spark.operators.assess import b3_scores

    truth = spark.createDataFrame(
        [(i, f"t{i % 5}") for i in range(20)], "id long, true_cluster string"
    )
    pred = spark.createDataFrame(
        [(i, "all") for i in range(20)], "id long, pred_cluster string"
    )
    row = b3_scores(pred, truth).collect()[0]
    assert row.b3_recall == 1.0
    assert row.b3_precision == round(4.0 / 20.0, 6)  # each record: 4/20


def test_skew_profile_surfaces_heavy_keys(spark):
    """A viral key dominates the report with the right share and factor;
    tie order is deterministic; top_n caps the output."""
    from linkorgs_software_spark.operators.assess import skew_profile

    rows = [(i, "viral") for i in range(80)] + [
        (100 + i, f"k{i % 10}") for i in range(20)
    ]
    df = spark.createDataFrame(rows, "id long, key string")
    out = skew_profile(df, "key", top_n=3).collect()
    assert [r.rank for r in out] == [1, 2, 3]
    top = out[0]
    assert top.key == "viral" and top.n_rows == 80
    assert top.row_share == 0.8
    # 11 distinct keys, mean 100/11 rows -> factor = 80/(100/11) = 8.8
    assert top.skew_factor == round(80 / (100 / 11), 6)
    # remaining keys tie at 2 rows -> lexicographic order
    assert [r.key for r in out[1:]] == ["k0", "k1"]


def test_skew_profile_composite_key_and_empty(spark):
    from linkorgs_software_spark.operators.assess import skew_profile

    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "x"), (3, "b", "y")], "id long, k1 string, k2 string"
    )
    out = {r.key: r.n_rows for r in skew_profile(df, ["k1", "k2"]).collect()}
    assert out == {"a|x": 2, "b|y": 1}
    empty = skew_profile(
        spark.createDataFrame([], "id long, key string"), "key"
    )
    assert empty.count() == 0


def test_b3_singleton_mode_hand_checked(spark):
    """unmatched="singleton": pred covers {1,2,3}, truth covers {2,3,4};
    one-sided records become singletons on the missing side. Hand math:
    P = (1/2 + 1/2 + 1 + 1)/4 = 0.75, R = (1 + 1/2 + 1/2 + 1)/4 = 0.75.
    Same data under the default drop mode keeps only {2,3}: P = 1 (each
    surviving pred cluster is a pure singleton over the joined records),
    R = 0.5."""
    from linkorgs_software_spark.operators.assess import b3_scores

    pred = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B")], "id long, pred_cluster string"
    )
    truth = spark.createDataFrame(
        [(2, "X"), (3, "X"), (4, "Y")], "id long, true_cluster string"
    )
    row = b3_scores(pred, truth, unmatched="singleton").collect()[0]
    assert row.n_records == 4
    assert row.b3_precision == 0.75
    assert row.b3_recall == 0.75
    assert row.b3_f1 == 0.75

    drop = b3_scores(pred, truth).collect()[0]
    assert drop.n_records == 2
    assert drop.b3_precision == 1.0
    assert drop.b3_recall == 0.5


def test_b3_singleton_mode_full_coverage_matches_drop(spark):
    """When both assignments cover every record, singleton mode must be
    byte-identical to drop mode (the outer join degenerates to inner)."""
    from linkorgs_software_spark.operators.assess import b3_scores

    pred = spark.createDataFrame(
        [(i, f"p{i % 4}") for i in range(40)], "id long, pred_cluster string"
    )
    truth = spark.createDataFrame(
        [(i, f"t{i % 3}") for i in range(40)], "id long, true_cluster string"
    )
    a = b3_scores(pred, truth).collect()[0]
    b = b3_scores(pred, truth, unmatched="singleton").collect()[0]
    assert a == b


def test_b3_bad_unmatched_raises(spark):
    import pytest as _pytest

    from linkorgs_software_spark.operators.assess import b3_scores

    df = spark.createDataFrame([(1, "a")], "id long, pred_cluster string")
    with _pytest.raises(ValueError, match="unmatched"):
        b3_scores(df, df.selectExpr("id", "pred_cluster as true_cluster"),
                  unmatched="bogus")


def test_canonicalize_clusters_election_and_ties(spark):
    from linkorgs_software_spark.operators.cluster import canonicalize_clusters

    rows = [
        # cluster 1: frequency wins — "acme" x2 beats "acme corp" x1
        (1, "acme"), (1, "acme"), (1, "acme corp"),
        # cluster 2: count tie, equal length -> lexicographic "aa"
        (2, "bb"), (2, "aa"),
        # cluster 3: count tie -> shorter "ab" beats "longer"
        (3, "longer"), (3, "ab"),
        # cluster 4: NULL names do not vote and are not counted
        (4, "solo"), (4, None),
    ]
    df = spark.createDataFrame(rows, "component long, name string")
    out = {r.component: r for r in canonicalize_clusters(df).collect()}
    assert out[1].canonical_name == "acme"
    assert out[1].canonical_count == 2
    assert out[1].n_members == 3
    assert out[1].n_distinct_names == 2
    assert abs(out[1].canonical_share - 0.666667) < 1e-6
    assert out[2].canonical_name == "aa"
    assert out[3].canonical_name == "ab"
    assert out[4].canonical_name == "solo"
    assert out[4].n_members == 1


def test_pairwise_scores_hand_checked(spark):
    """pred {a:{1,2}, b:{3}} vs truth {x:{1,2,3}}: pairs_pred=1 (both
    correct), pairs_true=3 -> P=1, R=1/3, F1=0.5; ARI: E = 1*3/C(3,2)=1,
    denom = (1+3)/2 - 1 = 1, ARI = (1-1)/1 = 0."""
    from linkorgs_software_spark.operators.assess import pairwise_scores

    pred = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id long, pred_cluster string"
    )
    truth = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "x")], "id long, true_cluster string"
    )
    r = pairwise_scores(pred, truth).collect()[0]
    assert r.n_records == 3
    assert r.n_pairs_pred == 1
    assert r.n_pairs_true == 3
    assert r.n_pairs_both == 1
    assert r.pair_precision == 1.0
    assert abs(r.pair_recall - 0.333333) < 1e-6
    assert r.pair_f1 == 0.5
    assert r.adjusted_rand == 0.0


def test_pairwise_scores_identical_and_degenerate(spark):
    from linkorgs_software_spark.operators.assess import pairwise_scores

    same = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b")], "id long, pred_cluster string"
    )
    truth = same.withColumnRenamed("pred_cluster", "true_cluster")
    r = pairwise_scores(same, truth).collect()[0]
    assert (r.pair_precision, r.pair_recall, r.pair_f1) == (1.0, 1.0, 1.0)
    assert r.adjusted_rand == 1.0

    # all-singleton on both sides: no pairs anywhere, ARI denominator 0 —
    # every ratio scores the documented 0.0, never NULL
    singles = spark.createDataFrame(
        [(1, "s1"), (2, "s2")], "id long, pred_cluster string"
    )
    t2 = singles.withColumnRenamed("pred_cluster", "true_cluster")
    r2 = pairwise_scores(singles, t2).collect()[0]
    assert r2.n_pairs_pred == 0 and r2.n_pairs_true == 0
    assert (r2.pair_precision, r2.pair_recall, r2.pair_f1, r2.adjusted_rand) == (
        0.0, 0.0, 0.0, 0.0,
    )


def test_resolution_diff_hand_checked(spark):
    """old A{1,2,3} splits into X{1,2}/Y{3}; B{4,5}+C{6} merge into
    Z{4,5,6}; D{7} survives untouched; 8 dropped by the new run, 9 new."""
    from linkorgs_software_spark.operators.assess import resolution_diff

    old = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "A"), (4, "B"), (5, "B"), (6, "C"),
         (7, "D"), (8, "E")],
        "id long, cluster string",
    )
    new = spark.createDataFrame(
        [(1, "X"), (2, "X"), (3, "Y"), (4, "Z"), (5, "Z"), (6, "Z"),
         (7, "W"), (9, "V")],
        "id long, cluster string",
    )
    r = resolution_diff(old, new).collect()[0]
    assert r.n_records == 7
    assert r.n_only_old == 1
    assert r.n_only_new == 1
    assert r.n_clusters_old == 4
    assert r.n_clusters_new == 4
    assert r.n_split == 1      # A
    assert r.n_merged == 1     # Z
    assert r.n_unchanged == 1  # D -> W


def test_golden_record_strategies_and_nulls(spark):
    """Per-field survivorship: majority (ties -> min), min, max, longest
    (ties -> min); NULLs never vote; an all-NULL field publishes NULL."""
    from linkorgs_software_spark.operators.cluster import golden_record

    recs = spark.createDataFrame(
        [
            # cluster 1: majority seg=A (2 votes vs 1); bal max 30;
            # name min "ann"; alias longest "carolyn", null never votes
            (1, "A", 10.0, "bob", "carolyn"),
            (1, "A", 30.0, "ann", "zz"),
            (1, "B", 20.0, "cid", None),
            # cluster 2: majority TIE A/B -> min "A"; alias all NULL -> NULL
            (2, "B", 5.0, "dee", None),
            (2, "A", None, "eve", None),
        ],
        "component long, seg string, bal double, nm string, alias string",
    )
    out = {
        r.component: r
        for r in golden_record(
            recs,
            {"seg": "majority", "bal": "max", "nm": "min", "alias": "longest"},
        ).collect()
    }
    assert out[1].n_members == 3
    assert (out[1].seg, out[1].bal, out[1].nm, out[1].alias) == (
        "A", 30.0, "ann", "carolyn",
    )
    assert (out[2].seg, out[2].bal, out[2].nm, out[2].alias) == (
        "A", 5.0, "dee", None,
    )


def test_golden_record_longest_tie_and_validation(spark):
    from linkorgs_software_spark.operators.cluster import golden_record

    recs = spark.createDataFrame(
        [(1, "bb"), (1, "aa"), (1, "c")], "component long, v string"
    )
    r = golden_record(recs, {"v": "longest"}).collect()[0]
    assert r.v == "aa"  # longest tie (bb/aa) -> minimum value
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown golden_record"):
        golden_record(recs, {"v": "mode"})
    with _pytest.raises(ValueError, match="cluster_col"):
        golden_record(recs, {"component": "min"})


def test_tfidf_cosine_scores_hand_checked(spark):
    """IDF-weighted token cosine: identical names score 1.0; suffix-only
    agreement scores the (low) squared unit weight of the common token;
    no shared token scores 0.0 — values checked against the closed form."""
    import math

    from linkorgs_software_spark.operators.scoring import tfidf_cosine_scores

    xp = spark.createDataFrame(
        [(1, "acme inc"), (2, "zeta inc")], "x_id long, name_norm string"
    )
    yp = spark.createDataFrame(
        [(10, "acme inc"), (11, "beta inc"), (12, "omega co")],
        "y_id long, name_norm string",
    )
    pairs = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 12)], "x_id long, y_id long"
    )
    out = {
        (r.x_id, r.y_id): r.tfidf_sim
        for r in tfidf_cosine_scores(pairs, xp, yp).collect()
    }
    # corpus = 4 DISTINCT names ("acme inc" on both sides counts once);
    # df(inc)=3, df(rare)=1
    idf_inc = math.log(5.0 / 4.0) + 1.0
    idf_rare = math.log(5.0 / 2.0) + 1.0
    u_inc = idf_inc / math.sqrt(idf_rare**2 + idf_inc**2)
    assert out[(1, 10)] == 1.0  # identical name
    assert out[(1, 11)] == round(u_inc * u_inc, 6)  # only "inc" shared
    assert out[(2, 10)] == round(u_inc * u_inc, 6)
    assert out[(2, 12)] == 0.0  # nothing shared
    # the suffix-only score is LOW: that's the operator's point
    assert out[(1, 11)] < 0.35


def test_triage_pairs_zones_and_null_policy(spark):
    """Fellegi-Sunter three zones: boundaries inclusive toward the safer
    zone, NULL distance goes to review (never silently dropped), and
    inverted thresholds raise."""
    from linkorgs_software_spark.operators.scoring import triage_pairs

    scored = spark.createDataFrame(
        [(1, 0.1), (2, 0.2), (3, 0.35), (4, 0.5), (5, 0.9), (6, None)],
        "pid long, stringdist double",
    )
    out = {
        r.pid: r.decision
        for r in triage_pairs(scored, match_max=0.2, review_max=0.5).collect()
    }
    assert out == {
        1: "match", 2: "match", 3: "review", 4: "review",
        5: "non_match", 6: "review",
    }
    import pytest as _pytest

    with _pytest.raises(ValueError, match="match_max"):
        triage_pairs(scored, match_max=0.6, review_max=0.5)
