#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_cdc_2_3_0_src_spark import queries as catalog
from flink_cdc_2_3_0_src_spark.session import get_spark

# Headline set: aggregation, join-heavy, CDC materialization/normalization,
# chunked snapshot — the shapes that dominate real workloads.
HEADLINE = [
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
]

# Heavy tail: the expensive non-headline operators (blocked fuzzy dedup,
# semantic dedup, span dedup, BPE training, CMS sketch).  Timed in a
# SECOND section so regressions in the costly operators are caught per
# round WITHOUT disturbing the frozen 15-headliner series the driver
# compares across rounds ("value" stays headline-only).
HEAVY_TAIL = [
    "dedup_fuzzy_blocked",
    "dedup_semantic",
    "dedup_spans",
    "text_bpe_train",
    "sketch_count_min",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("cdc-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()
    names = [n for n in HEADLINE if n in qs]
    # warm the JVM, parquet footers, and Python UDF workers (not timed)
    catalog.ld(spark, sf_dir, "region").count()
    from pyspark.sql import functions as F

    from flink_cdc_2_3_0_src_spark.functions.hashing import shingle_profile

    # repartition so every executor thread spawns (and keeps) its worker
    catalog.ld(spark, sf_dir, "documents").limit(256).repartition(32).select(
        shingle_profile(F.col("text"))
    ).count()

    def run(query_names: list[str]) -> dict[str, float]:
        out: dict[str, float] = {}
        for name in query_names:
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            n = df.count()
            out[name] = round(time.perf_counter() - t0, 4)
            _ = n
        return out

    timings = run(names)
    heavy = run([n for n in HEAVY_TAIL if n in qs])
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "heavy_tail": heavy,
                "heavy_tail_total": round(sum(heavy.values()), 4),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
