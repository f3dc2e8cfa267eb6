#!/usr/bin/env python
"""Run the full driver-style oracle compare at a given SF (default 0.01)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_cdc_2_3_0_src_spark import queries as catalog
from flink_cdc_2_3_0_src_spark.session import get_spark
from tests.oracle_harness import compare, compare_pandas

# The driver verifies the FIRST 50 registered queries with a
# repr-sensitive pandas hash (Spark toPandas vs DuckDB .df()).  The
# float-coercing `compare` is blind to the decimal-repr class that
# shipped cdc_sql_calc_project hash-red in r13, so the window queries
# must be checked with the driver-mimic `compare_pandas` here.
WINDOW = 50


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("cdc-correctness")
    spark.sparkContext.setLogLevel("ERROR")
    failures = 0
    window_names = set(list(catalog.queries())[:WINDOW])
    for name, fn in sorted(catalog.queries().items()):
        sql = catalog.oracle_sql().get(name)
        t0 = time.perf_counter()
        if sql is None:
            n = fn(spark, sf_dir).count()
            print(f"  {name}: rows-only check, {n} rows ({time.perf_counter()-t0:.1f}s)")
            continue
        cmp = compare_pandas if name in window_names else compare
        diff = cmp(fn(spark, sf_dir), sql, sf_dir)
        dt = time.perf_counter() - t0
        if diff is None:
            tag = "OK (driver-mimic)" if name in window_names else "OK"
            print(f"  {name}: {tag} ({dt:.1f}s)")
        else:
            failures += 1
            print(f"  {name}: FAIL — {diff} ({dt:.1f}s)")
    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
