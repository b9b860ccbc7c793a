"""Sessionize gap semantics + suggester contracts."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dawnsearch_spark.operators.sessionize import sessionize


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), float(v)) for u, m, v in rows],
        "user_id long, ts timestamp_ntz, value double",
    )


def test_gap_boundary_semantics(spark):
    # exactly the gap apart -> Spark merges INCLUSIVELY -> one session
    ev = _ev(spark, [(1, 0, 1.0), (1, 30, 2.0)])
    out = sessionize(ev, gap="30 minutes").collect()
    assert len(out) == 1
    assert out[0]["session_end"] == "2024-01-01 00:30:00"
    # one minute past the gap -> two sessions
    ev2 = _ev(spark, [(1, 0, 1.0), (1, 31, 2.0)])
    out2 = sessionize(ev2, gap="30 minutes").collect()
    assert len(out2) == 2
    # inside the gap -> one session with both events
    ev3 = _ev(spark, [(1, 0, 1.0), (1, 29, 2.0)])
    out3 = sessionize(ev3, gap="30 minutes").collect()
    assert len(out3) == 1
    assert out3[0]["n_events"] == 2 and out3[0]["sum_value"] == 3.0
    assert out3[0]["session_start"] == "2024-01-01 00:00:00"
    assert out3[0]["session_end"] == "2024-01-01 00:29:00"


def test_sessions_are_per_user(spark):
    ev = _ev(spark, [(1, 0, 1.0), (2, 1, 1.0), (1, 5, 1.0), (2, 90, 1.0)])
    out = sessionize(ev, gap="30 minutes").collect()
    per_user = {}
    for r in out:
        per_user[r["user_id"]] = per_user.get(r["user_id"], 0) + 1
    assert per_user == {1: 1, 2: 2}


def test_suggest_orders_by_cf_then_term(spark):
    from dawnsearch_spark.operators.boolquery import suggest_terms

    stats = spark.createDataFrame(
        [("scan", 5, 50), ("spark", 9, 50), ("shuffle", 2, 7), ("table", 9, 99)],
        "term string, df long, cf long",
    )
    got = [(r["term"], r["cf"]) for r in suggest_terms(stats, "s", n=2).collect()]
    assert got == [("scan", 50), ("spark", 50)]
    # non-single-token prefix -> empty
    assert suggest_terms(stats, "two words", n=5).count() == 0
    assert suggest_terms(stats, "", n=5).count() == 0


def test_split_stable_across_partitioning(spark):
    from dawnsearch_spark.operators.split import assign_splits

    df1 = spark.range(0, 500, 1, 2).withColumnRenamed("id", "doc_id")
    df2 = spark.range(0, 500, 1, 16).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: (r["bucket"], r["split"])
         for r in assign_splits(df1).collect()}
    b = {r["doc_id"]: (r["bucket"], r["split"])
         for r in assign_splits(df2).collect()}
    assert a == b
    # fractions roughly respected on 500 ids
    from collections import Counter
    c = Counter(v[1] for v in a.values())
    assert c["train"] > 350 and c["val"] > 20 and c["test"] > 20


def test_split_fraction_guard(spark):
    import pytest as _pytest
    from dawnsearch_spark.operators.split import assign_splits

    df = spark.range(5).withColumnRenamed("id", "doc_id")
    with _pytest.raises(ValueError):
        assign_splits(df, fractions={"train": 0.5, "test": 0.4})
