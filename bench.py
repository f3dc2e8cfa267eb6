#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Noise defense (round 6, tightened round 8): box load on the shared
runner has twice swamped the cross-round signal (r3->r4 and r4->r5
drifted every query uniformly by 10-30% with unchanged code), and the
r7 medians moved +5.4% inside a ~7% run-to-run spread the instrument
could not attribute.  Countermeasures, none changing the frozen
15-headliner contract (metric/value/queries semantics unchanged):
  - every headliner runs k=5 times (SPARK_GRAFT_BENCH_REPS, r8: 3->5)
    and "queries" reports per-query MEDIANS ("value" = sum of medians),
    so transient load spikes cannot poison a number;
  - "noise_band" / "heavy_tail_noise_band" emit per-query [min, max]
    across the reps, so a cross-round drift can be judged against the
    same-run spread instead of guessed at (r8);
  - a fixed-size, sf-independent CALIBRATION workload (20M-row codegen
    aggregate over spark.range — no I/O, no Python) is timed the same
    way and reported as "calibration_sec";
  - a second SHUFFLE-shaped probe (same 20M rows forced through a full
    64-partition hash exchange) is reported as
    "calibration_shuffle_sec" (r8): the codegen probe alone was blind
    to shuffle/IO contention, the component most query plans spend
    their time in.  Cross-round comparisons can divide by either to
    separate a real plan regression from a slow box.
"""

from __future__ import annotations

import json
import os
import statistics
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
# compares across rounds ("value" stays headline-only).  Medians over
# the same k reps as the headliners: single-rep heavy-tail numbers
# swung 2x between identical runs (GC/first-plan effects), which
# defeats the regression tracking they exist for.
HEAVY_TAIL = [
    "dedup_fuzzy_blocked",
    "dedup_semantic",
    "dedup_spans",
    "text_bpe_train",
    "sketch_count_min",
    # r14: the MATCH_RECOGNIZE NFA family's representative — the only
    # Python-heavy per-key path in the engine and, until this round,
    # the only expensive family with zero timing history (it was
    # runtime-graded via correctness wall-time only).  Additions to the
    # bench are contract-safe; existing names are never removed.
    "cdc_sql_match_recognize_nfa",
]


def _calibrate(spark, reps: int) -> float:
    """Fixed-size shuffle+codegen workload, independent of sf and of the
    repo's own code: median seconds over ``reps`` runs."""
    from pyspark.sql import functions as F

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        (
            spark.range(0, 20_000_000, 1, 32)
            .select(((F.col("id") * 2654435761) % 1_000_003).alias("k"))
            .groupBy((F.col("k") % 64).alias("g"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("s"))
            .orderBy("g")
            .collect()
        )
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 4)


def _calibrate_shuffle(spark, reps: int) -> float:
    """Fixed-size FULL-shuffle probe: the same 20M rows forced through a
    64-partition hash exchange before aggregating, so the probe spends
    its time where real query plans do (exchange write/read), which the
    pure-codegen probe cannot see.  Median seconds over ``reps``."""
    from pyspark.sql import functions as F

    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        (
            spark.range(0, 20_000_000, 1, 32)
            .select(((F.col("id") * 2654435761) % 1_000_003).alias("k"))
            .repartition(64, F.col("k"))
            .groupBy((F.col("k") % 997).alias("g"))
            .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("s"))
            .orderBy("g")
            .collect()
        )
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times), 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5")))
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

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        return time.perf_counter() - t0

    def run(query_names: list[str], k: int):
        # rep-major order (all queries once, then again) so a transient
        # load spike hits one rep of many queries, not all reps of one
        samples: dict[str, list[float]] = {n: [] for n in query_names}
        for _ in range(k):
            for name in query_names:
                samples[name].append(run_once(name))
        medians = {
            n: round(statistics.median(ts), 4) for n, ts in samples.items()
        }
        # rep 1 is what rounds 1-5 measured (single cold-ish run) —
        # emitted alongside so the cross-round series stays comparable
        # and the medians methodology change is transparent
        first = {n: round(ts[0], 4) for n, ts in samples.items()}
        band = {
            n: [round(min(ts), 4), round(max(ts), 4)]
            for n, ts in samples.items()
        }
        return medians, first, band

    calibration = _calibrate(spark, reps)
    calibration_shuffle = _calibrate_shuffle(spark, reps)
    timings, first_run, band = run(names, reps)
    heavy, heavy_first, heavy_band = run(
        [n for n in HEAVY_TAIL if n in qs], reps
    )
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "first_run": first_run,
                "first_run_total": round(sum(first_run.values()), 4),
                "noise_band": band,
                "reps": reps,
                "calibration_sec": calibration,
                "calibration_shuffle_sec": calibration_shuffle,
                "heavy_tail": heavy,
                "heavy_tail_first_run": heavy_first,
                "heavy_tail_total": round(sum(heavy.values()), 4),
                "heavy_tail_noise_band": heavy_band,
                # Scaling evidence (r14): echo the EFFECTIVE parallelism so
                # the driver's core-count check can confirm $SPARK_GRAFT_CPUS
                # took effect (r13's PERF flagged "suspect_cpus_ignored"
                # because the JSON line carried no proof; session.py honors
                # the env var — local[$SPARK_GRAFT_CPUS]).
                "cpus_env": os.environ.get("SPARK_GRAFT_CPUS"),
                "default_parallelism": spark.sparkContext.defaultParallelism,
                "master": spark.sparkContext.master,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
