"""Preprocessing + q-gram semantics — mirrors reference
test-preprocessing.R and the trigram index contract (BuildHelpers.R:190-205)."""

from pyspark.sql import functions as F

from linkorgs_software_spark.config import LinkConfig
from linkorgs_software_spark.functions.normalize import (
    normalize_expr,
    prepare_side,
    record_id_expr,
)
from linkorgs_software_spark.functions.qgrams import qgram_array_expr, qgram_set_expr


def _norm(spark, s, **kw):
    df = spark.createDataFrame([(s,)], "name string")
    return df.select(normalize_expr("name", **kw).alias("n")).first().n


def test_preprocessing_variants_converge(spark):
    # reference: test-preprocessing.R:5-59 — the three Microsoft variants
    a = "MICROSOFT CORPORATION INTERNATIONAL"
    b = "Microsoft. Corporation! International?"
    c = "Microsoft   Corporation    International"
    assert _norm(spark, a) == _norm(spark, b) == _norm(spark, c)


def test_preprocessing_flags_independent(spark):
    assert _norm(spark, "AbC", norm_space=False, remove_punct=False) == "abc"
    assert _norm(spark, "a.b", to_lower=False, norm_space=False) == "ab"
    assert _norm(spark, "a   b", to_lower=False, remove_punct=False) == "a b"
    # flags off => identity
    assert (
        _norm(spark, "A.  b", to_lower=False, norm_space=False, remove_punct=False)
        == "A.  b"
    )


def test_qgram_windows_include_short_tail(spark):
    # tails=True (scoring input): windows at every start pos incl. 1-2 char tails
    df = spark.createDataFrame([("abcd",)], "s string")
    grams = df.select(qgram_array_expr("s", 3).alias("g")).first().g
    assert grams == ["abc", "bcd", "cd", "d"]


def test_qgram_blocking_windows_match_reference_index(spark):
    # tails=False (blocking index, BuildHelpers.R:190-205): full windows only,
    # plus only the position-1 short window for strings shorter than q
    df = spark.createDataFrame([("abcd",), ("ab",), ("x",)], "s string")
    rows = df.select("s", qgram_array_expr("s", 3, tails=False).alias("g")).collect()
    got = {r.s: r.g for r in rows}
    assert got["abcd"] == ["abc", "bcd"]  # no 2/1-char tail windows
    assert got["ab"] == ["ab"]            # position-1 short window kept
    assert got["x"] == ["x"]


def test_qgram_empty_string(spark):
    df = spark.createDataFrame([("",)], "s string")
    assert df.select(qgram_array_expr("s", 3).alias("g")).first().g == []


def test_qgram_prefix_cap(spark):
    long = "x" * 300
    df = spark.createDataFrame([(long,)], "s string")
    grams = df.select(qgram_array_expr("s", 3, prefix_cap=100).alias("g")).first().g
    assert len(grams) == 100


def test_qgram_set_distinct(spark):
    df = spark.createDataFrame([("aaaa",)], "s string")
    # scoring sets keep only full-length q-grams (R stringdist convention)
    s = df.select(qgram_set_expr("s", 2).alias("g")).first().g
    assert sorted(s) == ["aa"]
    # the blocking index keeps short tails (reference index builder)
    s2 = df.select(qgram_set_expr("s", 2, full_only=False).alias("g")).first().g
    assert sorted(s2) == ["a", "aa"]


def test_record_id_duplicate_names_share_id(spark):
    # reference: digest of the name => duplicate names share an id
    # (LinkOrgs_LinkOrgs.R:530-535)
    df = spark.createDataFrame(
        [(1, "Acme Corp"), (2, "acme  corp!"), (3, "other co")],
        "id long, name string",
    )
    prep = prepare_side(df, "name", "x_id", LinkConfig())
    ids = {r.id: r.x_id for r in prep.collect()}
    assert ids[1] == ids[2]
    assert ids[1] != ids[3]


def test_prepare_side_drops_null_and_blank(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "   "), (3, "..."), (4, "real name")],
        "id long, name string",
    )
    prep = prepare_side(df, "name", "x_id", LinkConfig())
    assert [r.id for r in prep.collect()] == [4]
