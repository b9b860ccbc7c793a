"""Source layer: Iceberg-first with parquet fallback (SURVEY §2.1 S3)."""

from __future__ import annotations

import os

import pytest

from dawnsearch_spark.sources import is_iceberg_table_path, read_documents


def test_parquet_fallback_identical(spark, small_corpus, tmp_path):
    """auto-format over a plain parquet dir returns exactly spark.read.parquet."""
    p = str(tmp_path / "docs")
    small_corpus.write.parquet(p)
    direct = {r["doc_id"] for r in spark.read.parquet(p).select("doc_id").collect()}
    via = {r["doc_id"] for r in read_documents(spark, p).select("doc_id").collect()}
    assert via == direct and len(via) == 400


def test_predicate_pushdown_survives_source_layer(spark, small_corpus, tmp_path):
    """doc_id range predicates reach the parquet scan through the layer."""
    p = str(tmp_path / "docs")
    small_corpus.repartitionByRange(4, "doc_id").write.parquet(p)
    df = read_documents(spark, p).filter("doc_id >= 100 AND doc_id < 200")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "doc_id" in plan
    assert df.count() == 100


def test_iceberg_layout_detection(tmp_path):
    t = tmp_path / "tbl"
    (t / "metadata").mkdir(parents=True)
    (t / "metadata" / "v1.metadata.json").write_text("{}")
    (t / "data").mkdir()
    assert is_iceberg_table_path(str(t))
    assert not is_iceberg_table_path(str(tmp_path))


def test_iceberg_without_runtime_refuses_bare_read(spark, tmp_path):
    """An Iceberg table with no connector on the classpath must raise a
    clear error, never silently read bare data files (delete files /
    snapshot metadata would be ignored)."""
    t = tmp_path / "tbl"
    (t / "metadata").mkdir(parents=True)
    (t / "metadata" / "v1.metadata.json").write_text("{}")
    with pytest.raises(RuntimeError, match="[Ii]ceberg"):
        read_documents(spark, str(t))  # auto-detected
    with pytest.raises(RuntimeError, match="[Ii]ceberg"):
        read_documents(spark, "warehouse.db.tbl", format="iceberg")


def test_bad_format_rejected(spark):
    with pytest.raises(ValueError):
        read_documents(spark, "/nowhere", format="orc")


def test_snapshot_options_are_iceberg_only(spark, small_corpus, tmp_path):
    """snapshot args are accepted and ignored on the parquet path."""
    p = str(tmp_path / "docs")
    small_corpus.limit(10).write.parquet(p)
    assert read_documents(spark, p, snapshot_id=123).count() == 10


def test_env_smoke_iceberg_probe(spark):
    """The classpath probe itself must not throw (bool either way)."""
    from dawnsearch_spark.sources.documents import _iceberg_available

    assert _iceberg_available(spark) in (True, False)
    if os.environ.get("DAWNSEARCH_REQUIRE_ICEBERG"):
        assert _iceberg_available(spark)


def test_iceberg_roundtrip_when_connector_present(spark, small_corpus, tmp_path):
    """Connector-gated integration test (VERDICT r2 item 7): on a runtime
    WITH the Iceberg jars, write a path-based (HadoopTables) Iceberg table,
    read it back through read_documents (auto-detection), append, and pin
    the pre-append snapshot — proving the iceberg branch end-to-end.
    Skipped in this container (no jars); any jar-equipped runtime runs it."""
    from dawnsearch_spark.sources.documents import _iceberg_available

    if not _iceberg_available(spark):
        pytest.skip("no Iceberg connector on the classpath (container limitation)")

    t = str(tmp_path / "ice_tbl")
    base = small_corpus.select("repo", "path", "commit", "lang", "content").limit(20)
    base.write.format("iceberg").mode("overwrite").save(t)

    got = read_documents(spark, t)  # auto-detects the metadata dir
    assert got.count() == 20
    assert set(got.columns) >= {"repo", "path", "commit", "lang", "content"}

    snaps = spark.read.format("iceberg").load(t + "#snapshots").collect()
    first_snapshot = min(int(r["snapshot_id"]) for r in snaps)

    more = small_corpus.select("repo", "path", "commit", "lang", "content").limit(30)
    more.write.format("iceberg").mode("append").save(t)
    assert read_documents(spark, t).count() == 50
    pinned = read_documents(spark, t, snapshot_id=first_snapshot)
    assert pinned.count() == 20, "snapshot pin must serve the pre-append table"
