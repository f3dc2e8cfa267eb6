"""Bucketed co-located joins: pre-bucketing both sides on the join key
removes the shuffle entirely — the 100 TB strategy for repeated joins
on a stable key (SURVEY 'Partitioning & shuffle')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_cdc_2_3_0_src_spark.io import load_table
from tests.conftest import SF_SMOKE


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    # the in-memory catalog forgets tables between sessions but the
    # warehouse directory persists — clear both
    import shutil

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_customer"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("b_orders")
    )
    (
        customer.write.mode("overwrite")
        .bucketBy(8, "o_custkey")
        .sortBy("o_custkey")
        .saveAsTable("b_customer")
    )
    a = spark.table("b_orders")
    b = spark.table("b_customer")
    joined = a.join(b, "o_custkey")
    plan = plan_of(joined)
    # co-located: no shuffle exchange anywhere in the join plan
    assert "Exchange hashpartitioning" not in plan, plan
    # and the result is identical to the plain join
    assert joined.count() == orders.join(customer, "o_custkey").count()


def test_bucket_pruning_on_filter(spark):
    # single-key filter on a bucketed table reads one bucket. The
    # planner's auto-bucketed-scan heuristic skips bucketed reading for
    # plain scans, so pin it on for this assertion.
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        a = spark.table("b_orders").filter(F.col("o_custkey") == 7)
        plan = plan_of(a)
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
