"""Replicates the driver's correctness gate locally: every queries() entry
runs on Spark AND its oracle_sql() twin runs on DuckDB over the same sf0.01
parquet, comparing row count, column names, and sorted values."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _compare(sdf: pd.DataFrame, odf: pd.DataFrame, name: str):
    assert sorted(sdf.columns) == sorted(odf.columns), f"{name}: column names differ"
    assert len(sdf) == len(odf), f"{name}: row counts differ ({len(sdf)} vs {len(odf)})"
    # dtype-kind audit BEFORE normalization: the driver hashes raw values,
    # so an oracle-side type drift (e.g. DuckDB HUGEINT from an uncast
    # sum(BIGINT) arriving as float64/object) must fail here even when the
    # normalized values match.
    for c in sdf.columns:
        sk, ok = sdf[c].dtype.kind, odf[c].dtype.kind
        assert sk == ok or {sk, ok} <= {"i", "u"}, (
            f"{name}.{c}: dtype kind drift (spark {sdf[c].dtype} "
            f"vs oracle {odf[c].dtype}) — cast the oracle expression"
        )
    s, o = _normalize(sdf), _normalize(odf)
    for c in s.columns:
        sv, ov = s[c].to_numpy(), o[c].to_numpy()
        if pd.api.types.is_float_dtype(s[c]):
            exact = sum(1 for a, b in zip(sv, ov) if a == b or (math.isnan(a) and math.isnan(b)))
            close = all(
                (a == b) or (math.isnan(a) and math.isnan(b)) or math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
                for a, b in zip(sv, ov)
            )
            assert close, f"{name}.{c}: float values differ beyond 1e-9"
            # the driver hashes values exactly: demand exact equality of rounded floats
            assert exact == len(sv), f"{name}.{c}: {len(sv)-exact}/{len(sv)} floats not bit-equal after rounding"
        else:
            assert list(sv) == list(ov), f"{name}.{c}: values differ"


# every queries() entry now carries an oracle (the approx family verifies
# against its exported signature/assignment tables); kept as a mechanism
# for future genuinely non-SQL-expressible ops
ROWS_ONLY: set[str] = set()
NAMES = sorted(set(entrymod.queries()) - ROWS_ONLY)


def test_oracle_coverage():
    missing = set(entrymod.queries()) - set(entrymod.oracle_sql()) - ROWS_ONLY
    assert not missing, f"queries without oracle SQL: {missing}"
    assert not (ROWS_ONLY & set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    sdf = q(spark, SF_DIR).toPandas()
    odf = ddb.sql(sql).df()
    _compare(sdf, odf, name)


@pytest.mark.parametrize("name", sorted(ROWS_ONLY) or ["<none>"])
def test_rows_only_queries_run(spark, name):
    if name == "<none>":
        pytest.skip("no rows-only entries — everything is oracle-checked")
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0 and len(df.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert {"doc_id", "score", "snippet"} <= set(df.columns)
