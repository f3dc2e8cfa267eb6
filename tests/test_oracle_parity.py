"""Run every registered query against its DuckDB oracle at sf0.001 —
the local version of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from flink_cdc_2_3_0_src_spark import queries as catalog
from tests.conftest import SF_SMOKE
from tests.oracle_harness import compare

CASES = sorted(catalog.oracle_sql().keys())


@pytest.mark.parametrize("name", CASES)
def test_query_matches_oracle(spark, name):
    fn = catalog.queries()[name]
    sql = catalog.oracle_sql()[name]
    diff = compare(fn(spark, SF_SMOKE), sql, SF_SMOKE)
    assert diff is None, f"{name}: {diff}"


def test_entry_runs(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql().keys()) <= set(e.queries().keys())
