"""Focused pins for the round-13 optimization rewrites.

Each test targets an operator whose INTERNALS changed for performance
with output contractually identical:

  - normalize_upsert: two-branch union -> one window pass + explode
    (plan has exactly ONE Window and ONE key Exchange; rows unchanged
    vs an inline reference of the old two-branch formulation);
  - fuzzy_blocked char histogram: 27x JVM translate -> Arrow bincount
    (counts identical, including non-ASCII/None/empty edge rows);
  - tokens(): lambda-HOF filter -> array_remove (identical arrays);
  - load_table schema memo: metadata-only cache, refreshable.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from flink_cdc_2_3_0_src_spark.model import (
    OP_COL,
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE_AFTER,
    OP_UPDATE_BEFORE,
    SEQ_COL,
)
from flink_cdc_2_3_0_src_spark.operators.changelog import normalize_upsert


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _upsert_log(spark):
    rows = [
        # key 1: insert, update, delete, re-insert
        (1, 10.0, "+I", 1),
        (1, 11.0, "+U", 3),
        (1, None, "-D", 5),
        (1, 12.0, "+I", 7),
        # key 2: update arrives first (no +I), then delete, then delete again
        (2, 20.0, "+U", 2),
        (2, None, "-D", 4),
        (2, None, "-D", 6),
        # key 3: single insert
        (3, 30.0, "+I", 8),
        # control rows must be ignored
        (9, 99.0, "+H", 9),
    ]
    return spark.createDataFrame(
        rows, f"user_id int, value double, {OP_COL} string, {SEQ_COL} long"
    )


def _reference_two_branch(df, keys):
    """The pre-r13 formulation, kept verbatim as the semantics oracle."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(SEQ_COL)
    data_cols = [c for c in df.columns if c not in (OP_COL, SEQ_COL)]
    df = df.filter(F.col(OP_COL).isin(OP_INSERT, OP_UPDATE_AFTER, OP_DELETE))
    prev_img = F.lag(F.struct(*[F.col(c) for c in data_cols])).over(w)
    prev_op = F.lag(F.col(OP_COL)).over(w)
    wp = df.withColumn("__prev", prev_img).withColumn("__prev_op", prev_op)
    live = F.col("__prev").isNotNull() & (F.col("__prev_op") != OP_DELETE)
    cur = (
        wp.filter(F.col(OP_COL) != OP_DELETE)
        .withColumn(
            OP_COL,
            F.when(~live, F.lit(OP_INSERT)).otherwise(F.lit(OP_UPDATE_AFTER)),
        )
        .select(*data_cols, OP_COL, SEQ_COL)
    )
    retract = wp.filter(live).select(
        *[F.col(f"__prev.{c}").alias(c) for c in data_cols],
        F.when(F.col(OP_COL) == OP_DELETE, F.lit(OP_DELETE))
        .otherwise(F.lit(OP_UPDATE_BEFORE))
        .alias(OP_COL),
        F.col(SEQ_COL),
    )
    return cur.unionByName(retract)


def test_normalize_upsert_matches_two_branch_reference(spark):
    log = _upsert_log(spark)
    got = sorted(
        tuple(r) for r in normalize_upsert(log, ["user_id"]).collect()
    )
    want = sorted(
        tuple(r) for r in _reference_two_branch(log, ["user_id"]).collect()
    )
    assert got == want
    # the retraction discipline on the hand case, spelled out
    assert (1, 10.0, OP_UPDATE_BEFORE, 3) in got  # update retracts prior image
    assert (1, 11.0, OP_DELETE, 5) in got  # delete emits -D of prev image
    assert (2, 20.0, OP_DELETE, 4) in got
    assert all(r[0] != 9 for r in got)  # +H control row ignored


def test_normalize_upsert_single_window_plan(spark):
    """The r13 rewrite's whole point: ONE scan/exchange/sort/window."""
    log = _upsert_log(spark)
    plan = _plan(normalize_upsert(log, ["user_id"]))
    tree = plan.split("\n\n", 1)[0]  # numbered tree only: `Window (6)`
    assert len(re.findall(r"\bWindow \(\d+\)", tree)) == 1
    assert len(re.findall(r"\bExchange \(\d+\)", tree)) == 1
    assert "Union" not in tree
    assert len(re.findall(r"\bGenerate \(\d+\)", tree)) == 1  # the explode


def test_char_hist_udf_matches_translate(spark):
    import string

    from flink_cdc_2_3_0_src_spark.operators.dedup import _char_hist_udf

    rows = [
        ("hello world  ",),
        ("",),
        (" \t\n",),
        ("ünïcødé blend: abc xyz",),  # multibyte chars must not alias a-z
        ("ZZZ UPPER ONLY",),  # uppercase is outside the tracked bins
        (None,),
        ("a" * 1000 + " " * 5,),
    ]
    d = spark.createDataFrame(rows, "t string")
    ln = F.length("t")
    jvm = F.array(
        *[
            (ln - F.length(F.translate(F.col("t"), c, ""))).cast("int")
            for c in string.ascii_lowercase + " "
        ]
    )
    n = (
        d.filter(F.col("t").isNotNull())
        .select(jvm.alias("a"), _char_hist_udf()(F.col("t")).alias("b"))
        .filter("a IS DISTINCT FROM b")
        .count()
    )
    assert n == 0
    # NULL text: the JVM form yields an array of 27 NULLs, the UDF a
    # NULL array — distinct encodings, but the consumer (the L1 prune's
    # zip_with/aggregate) nulls out and drops the candidate under BOTH,
    # which is what matters; pin that equivalence.
    l1 = F.aggregate(
        F.zip_with("a", "b", lambda x, y: F.abs(x - y)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    kept = (
        d.filter(F.col("t").isNull())
        .select(jvm.alias("a"), _char_hist_udf()(F.col("t")).alias("b"))
        .select(l1.alias("l1"))
        .filter(F.col("l1") <= 10)
        .count()
    )
    assert kept == 0


def test_tokens_matches_hof_filter(spark):
    from flink_cdc_2_3_0_src_spark.functions.hashing import tokens

    rows = [
        ("  leading and trailing  ",),
        ("one",),
        ("",),
        ("\t tabs\nand\nnewlines \t",),
        ("MIXED Case  DOUBLE  spaces",),
        (None,),
    ]
    d = spark.createDataFrame(rows, "t string")
    hof = F.filter(
        F.split(F.lower(F.col("t")), r"\s+"), lambda x: x != F.lit("")
    )
    n = (
        d.select(tokens(F.col("t")).alias("a"), hof.alias("b"))
        .filter("a IS DISTINCT FROM b")
        .count()
    )
    assert n == 0


def test_load_table_schema_memo_roundtrip(spark):
    from flink_cdc_2_3_0_src_spark import io as _io

    sf = "/root/testdata/sf0.001"
    _io.refresh_schema_memo()
    a = _io.load_table(spark, sf, "events")  # miss: plain read, memoizes
    b = _io.load_table(spark, sf, "events")  # hit: schema-passed read
    assert a.schema == b.schema
    assert a.count() == b.count()
    assert any(k.endswith("events.parquet") for k in _io._SCHEMA_MEMO)
    _io.refresh_schema_memo()
    assert not _io._SCHEMA_MEMO


def test_lit_array_matches_per_element_lit(spark):
    """lit_array (one parsed SQL string) must be bit-identical to the
    per-element F.lit form it replaces — ints, round-trip floats, NULL,
    NaN/Infinity, empty."""
    from flink_cdc_2_3_0_src_spark.functions.exprs import lit_array

    ints = [0, 1, -7, 2**53, -(2**31), 999999999999]
    d = spark.range(1)
    r = d.select(
        (
            lit_array(ints, "bigint")
            == F.array(*[F.lit(v).cast("long") for v in ints])
        ).alias("ok_i"),
        (
            lit_array([0.123, -1.1, 3.141592653589793, 1e-300], "double")
            == F.array(
                *[
                    F.lit(v)
                    for v in [0.123, -1.1, 3.141592653589793, 1e-300]
                ]
            )
        ).alias("ok_f"),
        F.element_at(lit_array([None, 5], "bigint"), 1).isNull().alias("ok_n"),
        F.isnan(
            F.element_at(lit_array([float("nan")], "double"), 1)
        ).alias("ok_nan"),
        (F.size(lit_array([], "bigint")) == 0).alias("ok_e"),
    ).collect()[0]
    assert all(r), r


def test_bpe_result_single_partition(spark):
    from flink_cdc_2_3_0_src_spark.operators.text import bpe_train

    docs = spark.createDataFrame(
        [(1, "low low lower lowest"), (2, "new newer newest")],
        "doc_id long, text string",
    )
    out = bpe_train(docs, rounds=2)
    assert out.rdd.getNumPartitions() == 1
    assert out.count() == 2
