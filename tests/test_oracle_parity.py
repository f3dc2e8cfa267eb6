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


# Driver-mimic sweep: Spark via Arrow toPandas, oracle via DuckDB's
# .df() pandas fetch (coercion-faithful: DECIMAL/HUGEINT→float64), rows
# compared on STRING REPRS — the empirically validated model of the
# driver's hash (see compare_pandas' docstring; it is deliberately NOT
# dtype-exact, since the driver tolerates ns-vs-us / int-width drift).
# Round-3 lesson: `compare` above collects raw rows and so is blind to
# pandas-fetch coercions — b6_all_types_decode passed it locally while
# hash-failing at the driver for three rounds.  Only the driver-checked
# window (first 50 registered queries) gets this extra gate —
# past-window queries are covered by `compare`.
WINDOW = [n for n in list(catalog.queries())[:50] if n in catalog.oracle_sql()]


@pytest.mark.parametrize("name", WINDOW)
def test_window_query_driver_mimic(spark, name):
    from tests.oracle_harness import compare_pandas

    fn = catalog.queries()[name]
    sql = catalog.oracle_sql()[name]
    diff = compare_pandas(fn(spark, SF_SMOKE), sql, SF_SMOKE)
    assert diff is None, f"{name}: {diff}"
