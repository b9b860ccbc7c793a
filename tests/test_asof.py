"""As-of join contracts: backward-inclusive match, left-join NULLs,
per-key isolation, collision guard."""

from __future__ import annotations

import datetime as dt

import pytest

from dawnsearch_spark.operators.asof import asof_join


def _df(spark, schema, rows):
    return spark.createDataFrame(rows, schema)


def _ts(m):
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m)


def test_backward_inclusive_match(spark):
    left = _df(spark, "event_id long, user_id long, ts timestamp_ntz",
               [(0, 1, _ts(10)), (1, 1, _ts(20)), (2, 1, _ts(5))])
    right = _df(spark, "user_id long, ts timestamp_ntz, state string",
                [(1, _ts(10), "a"), (1, _ts(15), "b")])
    got = {r["event_id"]: r["state"]
           for r in asof_join(left, right, right_cols=["state"]).collect()}
    # t=10 matches the right row AT t=10 (inclusive); t=20 takes t=15;
    # t=5 has no prior state -> NULL
    assert got == {0: "a", 1: "b", 2: None}


def test_keys_do_not_leak(spark):
    left = _df(spark, "event_id long, user_id long, ts timestamp_ntz",
               [(0, 1, _ts(10)), (1, 2, _ts(10))])
    right = _df(spark, "user_id long, ts timestamp_ntz, state string",
                [(2, _ts(1), "only-user-2")])
    got = {r["event_id"]: r["state"]
           for r in asof_join(left, right, right_cols=["state"]).collect()}
    assert got == {0: None, 1: "only-user-2"}


def test_latest_of_many_right_rows(spark):
    left = _df(spark, "event_id long, user_id long, ts timestamp_ntz",
               [(0, 1, _ts(100))])
    right = _df(spark, "user_id long, ts timestamp_ntz, state string",
                [(1, _ts(m), f"s{m}") for m in (1, 40, 70, 99)])
    out = asof_join(left, right, right_cols=["state"]).collect()
    assert out[0]["state"] == "s99"


def test_column_collision_raises(spark):
    left = _df(spark, "event_id long, user_id long, ts timestamp_ntz, state string",
               [(0, 1, _ts(10), "x")])
    right = _df(spark, "user_id long, ts timestamp_ntz, state string",
                [(1, _ts(1), "y")])
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, right_cols=["state"])


def test_asof_random_matches_python_reference(spark):
    """Randomized cross-check: 400 left rows / 200 right rows over 12
    keys vs a bisect-based reference — one Spark job for all rows."""
    import bisect
    import random

    rng = random.Random(7)
    left_rows = [
        (i, rng.randrange(12), _ts(rng.randrange(10_000)))
        for i in range(400)
    ]
    right_rows = [
        (rng.randrange(12), _ts(rng.randrange(10_000)), f"s{i}")
        for i in range(200)
    ]
    left = _df(spark, "event_id long, user_id long, ts timestamp_ntz", left_rows)
    right = _df(spark, "user_id long, ts timestamp_ntz, state string", right_rows)

    by_key = {}
    for u, t, s in right_rows:
        by_key.setdefault(u, []).append((t, s))
    for u in by_key:
        by_key[u].sort()

    def ref(u, t):
        lst = by_key.get(u, [])
        i = bisect.bisect_right([x[0] for x in lst], t)
        return lst[i - 1][1] if i else None

    got = {r["event_id"]: r["state"]
           for r in asof_join(left, right, right_cols=["state"]).collect()}
    want = {eid: ref(u, t) for eid, u, t in left_rows}
    assert got == want


def test_null_right_col_rides_with_its_row(spark):
    """Row-level carry (ADVICE r6): when the most recent right row holds a
    NULL in one carried column, that NULL must ride with the row — the
    per-column formulation stitched the NULL-free value from an OLDER row,
    diverging from DuckDB's ASOF JOIN."""
    left = _df(spark, "event_id long, user_id long, ts timestamp_ntz",
               [(0, 1, _ts(10))])
    right = _df(spark, "user_id long, ts timestamp_ntz, a long, b string",
                [(1, _ts(5), 7, "old"), (1, _ts(8), None, "new")])
    rows = asof_join(left, right, right_cols=["a", "b"]).collect()
    assert len(rows) == 1
    assert rows[0]["b"] == "new"
    assert rows[0]["a"] is None  # not 7 — the whole latest row rides
