#!/usr/bin/env python
"""Per-query job/stage profile via the Spark UI REST API.

Usage: python scripts/profile_query.py <name> [<name> ...]

Runs each query once (same .count() action as bench.py) in a session
with the UI enabled, then prints every job and stage with durations,
task counts and shuffle bytes — the measurement step of guide §1.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_cdc_2_3_0_src_spark import queries as catalog
from flink_cdc_2_3_0_src_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "profile", conf={"spark.ui.enabled": "true", "spark.ui.port": "4099"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = catalog.queries()
    # warm like bench.py does
    catalog.ld(spark, sf_dir, "region").count()
    from pyspark.sql import functions as F

    from flink_cdc_2_3_0_src_spark.functions.hashing import shingle_profile

    catalog.ld(spark, sf_dir, "documents").limit(256).repartition(32).select(
        shingle_profile(F.col("text"))
    ).count()

    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4099/api/v1/applications/{app_id}"

    def rest(path):
        with urllib.request.urlopen(base + path) as r:
            return json.load(r)

    for name in names:
        jobs_before = {j["jobId"] for j in rest("/jobs")}
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        wall = time.perf_counter() - t0
        jobs = [j for j in rest("/jobs") if j["jobId"] not in jobs_before]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"\n=== {name}: wall {wall:.3f}s, {len(jobs)} jobs ===")
        stage_ids = set()
        for j in jobs:
            from datetime import datetime

            def ms(s):
                return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f")

            dur = (
                (ms(j["completionTime"]) - ms(j["submissionTime"]))
                .total_seconds()
                if "completionTime" in j
                else -1
            )
            print(
                f"  job {j['jobId']:>4} {dur:7.3f}s stages={j['stageIds']}"
                f" tasks={j['numCompletedTasks']}"
            )
            stage_ids.update(j["stageIds"])
        for sid in sorted(stage_ids):
            try:
                sts = rest(f"/stages/{sid}")
            except Exception:
                continue
            for st in sts:
                if st["status"] == "SKIPPED":
                    print(f"  stage {sid:>4} SKIPPED")
                    continue
                print(
                    f"  stage {sid:>4} {st['status']:9s}"
                    f" tasks={st['numCompleteTasks']:<4}"
                    f" run={st['executorRunTime']/1000:7.2f}s"
                    f" cpu={st['executorCpuTime']/1e9:7.2f}s"
                    f" shW={st['shuffleWriteBytes']:>9}"
                    f" shR={st['shuffleReadBytes']:>9}"
                    f" in={st['inputBytes']:>9}"
                    f"  {st['name'].splitlines()[0][:70]}"
                )


if __name__ == "__main__":
    main()
