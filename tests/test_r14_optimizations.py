"""Focused pins for the round-14 optimization rewrites.

Each test targets an operator whose INTERNALS changed for performance
with output contractually identical:

  - _MatchNfaPlan._explode: explicit repartition before the grouped-
    pandas NFA scan (AQE's size-based coalescing had folded every key
    into ONE task — 10-16s per batch at sf0.1);
  - _ckpt: skips frames already rooted at a LogicalRDD (plans that
    self-checkpoint state were paying a second eager materialization
    job per state piece per batch);
  - cms_heavy_hitters: the probe reads cells through a broadcast join
    instead of a driver collect folded back as literal arrays
    (min(coalesce(n,0)) over d joined cells == least(element_at(...)));
  - spread_small_scan min_bytes gate: a sub-split corpus keeps the
    exchange-free scan plan (ann_topk), an explicit-splits caller is
    unaffected.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_nfa_explode_repartitions_before_grouped_pandas(spark):
    """The NFA pandas scan must not run all keys in one task: the plan
    carries an explicit REPARTITION exchange (coalescing-exempt)
    feeding FlatMapGroupsInPandas, and no SECOND exchange between them
    (the repartition hash-satisfies the groupBy distribution)."""
    from flink_cdc_2_3_0_src_spark.operators.maintain import _MatchNfaPlan

    plan = _MatchNfaPlan(
        {
            "partition": ["u"],
            "order": "ts",
            "within": "1 day",
            "pattern": "A B+",
            "defines": {"A": "et = 'view'", "B": "et = 'click'"},
            "measures": [("count(*)", "n")],
        },
        ttl=None,
        op_col="__op",
        seq_col="__seq",
    )
    pool = spark.createDataFrame(
        [("u1", "2024-01-01 00:00:00", "view", 1)],
        "u string, ts string, et string, __seq long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    import re

    txt = _plan(plan._explode(pool))
    assert "FlatMapGroupsInPandas" in txt
    # exactly one exchange feeds the pandas node, and it is the
    # explicit coalescing-exempt hash repartition
    n_exch = len(re.findall(r"\(\d+\) Exchange", txt))
    assert n_exch == 1, txt
    assert "REPARTITION_BY_NUM" in txt, txt


def test_ckpt_skips_already_checkpointed_frames(spark):
    from flink_cdc_2_3_0_src_spark.plans.sql_maintain import (
        _ckpt,
        _is_ckpt_scan,
    )

    df = spark.range(3).withColumn("v", F.col("id") * 2)
    assert not _is_ckpt_scan(df)
    ck = df.localCheckpoint(eager=True)
    assert _is_ckpt_scan(ck)
    # idempotent: the SAME frame comes back, no re-materialization
    assert _ckpt(ck) is ck
    # non-checkpointed frames still get checkpointed
    out = _ckpt(df)
    assert out is not df and _is_ckpt_scan(out)
    # tuples recurse, None passes through
    t = _ckpt((ck, None, df))
    assert t[0] is ck and t[1] is None and _is_ckpt_scan(t[2])


def test_cms_broadcast_probe_matches_literal_fold(spark):
    """The r14 broadcast-join probe must compute the exact estimates
    the r13 literal-array fold computed: min over the d cells with
    absent cells read as 0."""
    from flink_cdc_2_3_0_src_spark.io import load_table
    from flink_cdc_2_3_0_src_spark.operators.sketch import (
        _ROWS,
        cms_build,
        cms_heavy_hitters,
    )
    from flink_cdc_2_3_0_src_spark.functions.hashing import (
        poly_hash_expr,
        tokens,
    )

    docs = load_table(spark, SF, "documents")
    got = {
        r["tok"]: (r["exact_n"], r["cms_n"], r["overestimate"])
        for r in cms_heavy_hitters(docs, top_k=10, width=64).collect()
    }
    # reference: the old driver-side fold over the collected matrix
    vocab = (
        docs.select(F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .select("tok", "exact_n", poly_hash_expr(F.col("tok")).alias("h"))
    )
    mat = cms_build(vocab, width=64, weight_col="exact_n")
    P = 2_147_483_647
    ref_rows = vocab.orderBy(
        F.col("exact_n").desc(), F.col("tok")
    ).limit(10).collect()
    assert len(got) == len(ref_rows)
    for r in ref_rows:
        h = (r["h"] % P + P) % P
        est = min(
            mat.get((ri, ((a * h + b) % P) % 64), 0)
            for ri, (a, b) in enumerate(_ROWS)
        )
        assert got[r["tok"]] == (r["exact_n"], est, est - r["exact_n"]), r


def test_spread_min_bytes_gate(spark):
    from flink_cdc_2_3_0_src_spark.io import (
        load_table,
        max_partition_bytes,
        spread_small_scan,
    )

    par = spark.sparkContext.defaultParallelism
    one_file = load_table(spark, SF, "embeddings").select("vec_id")
    # tiny single-file scan + a bound larger than the file: NOT spread
    gated = spread_small_scan(one_file, "vec_id", min_bytes=1 << 30)
    assert "Exchange" not in _plan(gated)
    # same scan without the bound: spread (the r13 behavior)
    spread = spread_small_scan(one_file, "vec_id")
    assert "Exchange" in _plan(spread)
    # explicit expected_splits hint bypasses the stat loop and the gate
    hinted = spread_small_scan(
        one_file, "vec_id", expected_splits=par, min_bytes=1 << 30
    )
    assert "Exchange" not in _plan(hinted)
    assert max_partition_bytes(spark) > 0
