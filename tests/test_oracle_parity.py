"""One parametrized test per registered query with an oracle — the
local mirror of the driver's CORRECTNESS gate. Queries without oracles
get a rows-only smoke test."""

from __future__ import annotations

import pytest

from tests.oracle_harness import check_query
from vector_search_ner_spark.registry import collect

_QUERIES, _ORACLES = collect()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    check_query(spark, name, sf_dir)


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only(spark, sf_dir, name):
    df = _QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema) > 0
