#!/usr/bin/env python
"""Dump .explain("formatted") for the benched queries to plans/<tag>/.

Usage: python scripts/dump_plans.py <outdir> [suffix] [name ...]

Driver-side only (no jobs run). Used by the optimization rounds to
commit before/after plan evidence the judge can diff.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_cdc_2_3_0_src_spark import queries as catalog
from flink_cdc_2_3_0_src_spark.session import get_spark

BENCHED = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_volume",
    "q7_nation_volume",
    "q10_returned_items",
    "cdc_materialize",
    "cdc_signed_sum",
    "cdc_chunked_snapshot",
    "cdc_hybrid_pipeline",
    "events_hourly_window",
    "events_sessionize",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "text_token_histogram",
    "ann_topk_cosine",
    "dedup_fuzzy_blocked",
    "dedup_semantic",
    "dedup_spans",
    "text_bpe_train",
    "sketch_count_min",
]


def main() -> None:
    outdir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or BENCHED
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # a query whose build itself runs jobs may fail
            plan = f"PLAN CAPTURE FAILED: {e}"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
