"""Plan-shape regression tests: the optimizations we rely on at scale
must be visible in .explain() output — filter pushdown, column pruning,
broadcast joins, partial aggregation, no Python UDFs in relational
paths, salted ops exactness."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_cdc_2_3_0_src_spark import queries as catalog
from flink_cdc_2_3_0_src_spark.io import load_table
from flink_cdc_2_3_0_src_spark.operators.skew import salted_agg, salted_join
from tests.conftest import SF_SMOKE


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_q1_pushdown_and_partial_agg(spark):
    df = catalog.q1_pricing_summary(spark, SF_SMOKE)
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    assert "partial_sum" in plan  # map-side combine before the exchange
    # column pruning: o_orderkey etc. not read; only the 7 needed columns
    assert "ReadSchema: struct<l_quantity:double,l_extendedprice:double" in plan


def test_q5_broadcasts_dimensions(spark):
    plan = plan_of(catalog.q5_regional_volume(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 3  # supplier, nation, region
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") <= 2


def test_chunked_scan_pushes_range_predicates(spark):
    df = catalog.cdc_chunked_snapshot(spark, SF_SMOKE)
    plan = plan_of(df)
    # each chunk's range predicate reaches its parquet scan
    assert "GreaterThanOrEqual(l_orderkey" in plan
    assert "LessThan(l_orderkey" in plan


def test_relational_paths_have_no_python_udf(spark):
    for name in [
        "q1_pricing_summary", "q3_shipping_priority", "q5_regional_volume",
        "q7_nation_volume", "q10_returned_items", "cdc_materialize",
        "cdc_signed_sum", "events_hourly_window", "rollup_sales",
    ]:
        plan = plan_of(catalog.queries()[name](spark, SF_SMOKE))
        assert "Python" not in plan, f"{name} has Python in the hot path"


def test_materialize_is_single_shuffle(spark):
    df = catalog.cdc_materialize(spark, SF_SMOKE)
    plan = plan_of(df)
    assert plan.count("Exchange") <= 2  # agg exchange (+AQE read)
    assert "Window" not in plan  # max_by aggregation, not window sort


def test_new_pipeline_ops_plan_shapes(spark):
    """Scale-shape contracts for the late-round operators: zero-shuffle
    projections stay zero-shuffle, the decontam benchmark set is
    broadcast (never sort-merge), packing reuses one exchange."""
    qs = catalog.queries()
    # RAG chunking + int8 encode: pure projections, no exchange at all
    for name in ("rag_chunk_windows", "embedding_quantize_int8"):
        plan = plan_of(qs[name](spark, SF_SMOKE))
        assert "Exchange" not in plan, f"{name} gained a shuffle"
    # decontamination: benchmark side must broadcast
    plan = plan_of(qs["decontam_ngram_overlap"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # sequence packing: window + groupBy share the (source) partitioning
    plan = plan_of(qs["pack_sequences"](spark, SF_SMOKE))
    assert plan.count("Exchange") <= 2  # one shuffle (+AQE read)
    # SCD2: one shuffle, no self-join
    plan = plan_of(qs["cdc_scd2_history"](spark, SF_SMOKE))
    assert plan.count("Exchange") <= 2
    assert "Join" not in plan


def test_salted_agg_exact(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    direct = {
        (r["o_orderstatus"], r["n"], str(r["s"]))
        for r in o.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"))
        .collect()
    }
    salted = {
        (r["o_orderstatus"], r["n"], str(r["s"]))
        for r in salted_agg(
            o,
            ["o_orderstatus"],
            {"n": F.count(F.lit(1)),
             "s": F.sum(F.col("o_totalprice").cast("decimal(18,2)"))},
            {"n": "sum", "s": "sum"},
        ).collect()
    }
    assert direct == salted


def test_salted_join_exact(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    c = load_table(spark, SF_SMOKE, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    direct = o.join(c, "o_custkey").count()
    salted = salted_join(o, c, "o_custkey").count()
    assert direct == salted


def test_salted_join_every_allowed_mode_matches_plain_join(spark):
    import pytest

    # small side missing some keys AND having extra keys, so outer/semi/
    # anti modes all have distinguishing rows
    big = spark.createDataFrame(
        [(k, f"b{i}") for i, k in enumerate([1, 1, 1, 2, 3, 3, 4])], "k long, bv string"
    )
    small = spark.createDataFrame(
        [(1, "s1"), (3, "s3"), (99, "s99")], "k long, sv string"
    )
    for how in ["inner", "left", "left_outer", "left_semi", "left_anti"]:
        plain = sorted(map(tuple, big.join(small, "k", how).collect()))
        salted = sorted(map(tuple, salted_join(big, small, "k", how=how).collect()))
        assert salted == plain, how
    # modes that would duplicate unmatched small-side rows are rejected
    for how in ["right", "right_outer", "full", "full_outer", "outer"]:
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(big, small, "k", how=how)
