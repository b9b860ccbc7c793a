from __future__ import annotations

import pytest

from dawnsearch_spark.config import EngineConfig
from dawnsearch_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("dawnsearch-tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def cfg() -> EngineConfig:
    return EngineConfig().scaled_for_tests()


@pytest.fixture(scope="session")
def small_corpus(spark):
    """400-doc deterministic corpus with doc ids + sha, cached for the session."""
    from dawnsearch_spark.corpus import generate_corpus, with_content_sha
    from dawnsearch_spark.operators.docids import assign_doc_ids

    df = with_content_sha(generate_corpus(spark, 400, seed=42, vocab_size=2000))
    df = assign_doc_ids(df, ("repo", "path", "commit"), parts=8).cache()
    df.count()
    return df
