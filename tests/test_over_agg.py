"""OVER aggregation maintenance (_OverPlan — Flink's
StreamExecOverAggregate: ``FN(v) OVER (PARTITION BY k ORDER BY ts
ROWS|RANGE BETWEEN .. PRECEDING AND CURRENT ROW)`` over an append-only
stream).  Split-invariance for all three frame forms (ROWS n / RANGE
interval / UNBOUNDED), the append-only contract, state retention
bounds, and TTL; the SQL surface rides below."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_cdc_2_3_0_src_spark.model import OP_COL, SEQ_COL
from flink_cdc_2_3_0_src_spark.operators.maintain import maintain

COLS = ["k", "ts", "v", OP_COL, SEQ_COL]


def _rows_log(spark):
    # per-key event times strictly increase with seq (the in-order
    # contract both Flink's watermark and the family's replay model
    # give); key b exercises NULL values in the frame
    rows = [
        ("a", 10, 1.0, "+I", 1),
        ("a", 20, 2.0, "+I", 2),
        ("b", 15, 5.0, "+I", 3),
        ("a", 30, 4.0, "+I", 4),
        ("b", 25, None, "+I", 5),
        ("a", 40, 8.0, "+I", 6),
        ("b", 35, 7.0, "+I", 7),
        ("a", 50, 16.0, "+I", 8),
    ]
    return spark.createDataFrame(rows, COLS).select(
        "k", F.col("ts").cast("long").alias("ts"), "v",
        OP_COL, F.col(SEQ_COL).cast("long").alias(SEQ_COL),
    )


def _seq_batches(df, n_batches):
    hi = int(df.agg(F.max(SEQ_COL)).collect()[0][0])
    out = []
    for i in range(n_batches):
        lo = i * (hi + 1) // n_batches
        up = (i + 1) * (hi + 1) // n_batches
        out.append(df.filter((F.col(SEQ_COL) >= lo) & (F.col(SEQ_COL) < up)))
    return out


def _replay(spark, plan, n_batches, cols=("k", "ts", "s")):
    state, rows = None, []
    for b in _seq_batches(_rows_log(spark), n_batches):
        state, out = plan.step(state, b)
        got = out.collect()
        assert all(r["__mult"] == 1 for r in got)
        rows.extend(tuple(r[c] for c in cols) for r in got)
    return state, set(rows)


# SUM over ROWS BETWEEN 1 PRECEDING AND CURRENT ROW
EXPECT_ROWS1 = {
    ("a", 10, 1.0), ("a", 20, 3.0), ("a", 30, 6.0), ("a", 40, 12.0),
    ("a", 50, 24.0),
    ("b", 15, 5.0), ("b", 25, 5.0), ("b", 35, 7.0),
}
# SUM over RANGE 15 'time units' (micros in test: ts treated as
# timestamp-castable longs? no — RANGE uses timestamps; see range test)
EXPECT_UNBOUNDED = {
    ("a", 10, 1.0), ("a", 20, 3.0), ("a", 30, 7.0), ("a", 40, 15.0),
    ("a", 50, 31.0),
    ("b", 15, 5.0), ("b", 25, 5.0), ("b", 35, 12.0),
}


@pytest.mark.parametrize("n_batches", [1, 2, 4])
def test_over_rows_frame_split_invariance(spark, n_batches):
    plan = maintain(over={"partition": ["k"], "order": "ts",
                          "aggs": {"s": ("sum", "v")}, "rows": 1})
    _, got = _replay(spark, plan, n_batches)
    assert got == EXPECT_ROWS1


@pytest.mark.parametrize("n_batches", [1, 3])
def test_over_unbounded_split_invariance(spark, n_batches):
    plan = maintain(over={"partition": ["k"], "order": "ts",
                          "aggs": {"s": ("sum", "v")}})
    state, got = _replay(spark, plan, n_batches)
    assert got == EXPECT_UNBOUNDED
    # unbounded state is ONE accumulator row per key — never history
    assert state.count() == 2


def test_over_unbounded_min_max_count_avg(spark):
    plan = maintain(over={"partition": ["k"], "order": "ts", "aggs": {
        "mn": ("min", "v"), "mx": ("max", "v"),
        "n": ("count", "*"), "nv": ("count", "v"), "a": ("avg", "v"),
    }})
    state, rows = None, {}
    for b in _seq_batches(_rows_log(spark), 3):
        state, out = plan.step(state, b)
        for r in out.collect():
            rows[(r["k"], r["ts"])] = (
                r["mn"], r["mx"], r["n"], r["nv"], r["a"]
            )
    # key b: NULLs excluded from min/max/avg/count(v), counted by n
    assert rows[("b", 15)] == (5.0, 5.0, 1, 1, 5.0)
    assert rows[("b", 25)] == (5.0, 5.0, 2, 1, 5.0)
    assert rows[("b", 35)] == (5.0, 7.0, 3, 2, 6.0)
    assert rows[("a", 50)] == (1.0, 16.0, 5, 5, 31.0 / 5)


def test_over_rows_state_retention_bound(spark):
    plan = maintain(over={"partition": ["k"], "order": "ts",
                          "aggs": {"s": ("sum", "v")}, "rows": 2})
    state = None
    for b in _seq_batches(_rows_log(spark), 2):
        state, _ = plan.step(state, b)
    # retention: at most `rows`=2 rows per key
    per_key = {
        r["k"]: r["n"]
        for r in state.groupBy("k").agg(F.count("*").alias("n")).collect()
    }
    assert per_key == {"a": 2, "b": 2}


def test_over_range_frame_with_timestamps(spark):
    rows = [
        ("a", "2024-01-01 00:00:10", 1.0, "+I", 1),
        ("a", "2024-01-01 00:00:20", 2.0, "+I", 2),
        ("a", "2024-01-01 00:00:45", 4.0, "+I", 3),
        ("a", "2024-01-01 00:00:55", 8.0, "+I", 4),
    ]
    log = spark.createDataFrame(rows, COLS).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    plan = maintain(over={"partition": ["k"], "order": "ts",
                          "aggs": {"s": ("sum", "v")},
                          "range": "15 seconds"})
    state, got = None, {}
    hi = 4
    for i in range(2):
        b = log.filter(
            (F.col(SEQ_COL) > i * hi // 2) & (F.col(SEQ_COL) <= (i + 1) * hi // 2)
        )
        state, out = plan.step(state, b)
        for r in out.collect():
            got[str(r["ts"])] = r["s"]
    assert got == {
        "2024-01-01 00:00:10": 1.0,
        "2024-01-01 00:00:20": 3.0,   # 10s within 15s of 20s
        "2024-01-01 00:00:45": 4.0,   # nothing within 15s
        "2024-01-01 00:00:55": 12.0,  # 45s within 15s of 55s
    }
    # range retention: only rows within 15s of each key's max remain
    assert state.count() == 2


def test_over_append_only_contract_and_errors(spark):
    plan = maintain(over={"partition": ["k"], "order": "ts",
                          "aggs": {"s": ("sum", "v")}, "rows": 1})
    bad = spark.createDataFrame([("a", 1, 1.0, "-D", 1)], COLS)
    with pytest.raises(ValueError, match="append-only"):
        plan.step(None, bad)
    with pytest.raises(ValueError, match="not both"):
        maintain(over={"partition": ["k"], "order": "ts",
                       "aggs": {"s": ("sum", "v")}, "rows": 1,
                       "range": "1 hours"})
    with pytest.raises(ValueError, match="non-empty partition"):
        maintain(over={"partition": [], "order": "ts",
                       "aggs": {"s": ("sum", "v")}})
    with pytest.raises(ValueError, match="needs"):
        maintain(over={"partition": ["k"]})
    with pytest.raises(ValueError, match="ORDER BY time column"):
        maintain(over={"partition": ["k"], "order": "ts",
                       "aggs": {"s": ("sum", "v")}, "rows": 1}, ttl="v")
    with pytest.raises(ValueError, match="ttl does not apply"):
        maintain(over={"partition": ["k"], "order": "ts",
                       "aggs": {"s": ("sum", "v")}}, ttl="ts").expire(
            None, 0
        )


def test_over_ttl_evicts_bounded_state(spark):
    plan = maintain(over={"partition": ["k"], "order": "ts",
                          "aggs": {"s": ("sum", "v")}, "rows": 5},
                    ttl="ts")
    state = None
    for b in _seq_batches(_rows_log(spark), 2):
        state, _ = plan.step(state, b)
    kept = plan.expire(state, 30)
    assert {r["ts"] for r in kept.collect()} == {30, 40, 50, 35}


# ---------------------------------------------------------------------
# SQL surface: FN(x) OVER (PARTITION BY k ORDER BY ts [frame]) FROM t
# (plans/sql_maintain.py shape "over" → _OverPlan) — Flink's
# StreamExecOverAggregate syntax over the maintenance bridge.
# ---------------------------------------------------------------------

def _ts_log(spark):
    """Append-only changelog with a real timestamp order column (the
    RANGE frame casts through timestamps) and per-key in-order
    arrivals; v has a NULL for SQL-null-semantics coverage."""
    rows = [
        (1, "a", 1.0, "2024-01-01 00:01:00"),
        (2, "b", 5.0, "2024-01-01 00:02:00"),
        (3, "a", 2.0, "2024-01-01 00:03:00"),
        (4, "a", None, "2024-01-01 00:04:00"),
        (5, "b", 7.0, "2024-01-01 00:30:00"),
        (6, "a", 4.0, "2024-01-01 00:31:00"),
        (7, "a", 8.0, "2024-01-01 00:32:00"),
        (8, "b", 9.0, "2024-01-01 00:33:00"),
    ]
    return spark.createDataFrame(
        rows, "id long, k string, v double, ts string"
    ).select(
        "id", "k", "v", F.col("ts").cast("timestamp").alias("ts"),
        F.lit("+I").alias(OP_COL), F.col("id").alias(SEQ_COL),
    )


def _one_shot(spark, df, over_sql):
    df.drop(OP_COL).createOrReplaceTempView("__t")
    return {
        tuple(r)
        for r in spark.sql(
            f"SELECT id, k, v, {over_sql} AS o FROM __t"
        ).collect()
    }


def _sql_replay(spark, sql, log, n_batches=3):
    from flink_cdc_2_3_0_src_spark.plans.sql_maintain import (
        replay_insert_maintained,
    )

    out = replay_insert_maintained(
        sql, {"src": ["id"]}, {"src": log}, n_batches=n_batches
    )
    return {tuple(r) for r in out.collect()}


def test_sql_over_rows_frame_matches_one_shot(spark):
    log = _ts_log(spark)
    sql = (
        "INSERT INTO sink SELECT id, k, v, SUM(v) OVER (PARTITION BY k"
        " ORDER BY ts ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS o"
        " FROM src"
    )
    expected = _one_shot(
        spark, log,
        "SUM(v) OVER (PARTITION BY k ORDER BY ts, _seq"
        " ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)",
    )
    for n in (1, 3):
        assert _sql_replay(spark, sql, log, n) == expected


def test_sql_over_range_frame_matches_one_shot(spark):
    log = _ts_log(spark)
    sql = (
        "INSERT INTO sink SELECT id, k, v, AVG(v) OVER (PARTITION BY k"
        " ORDER BY ts RANGE BETWEEN INTERVAL '5' MINUTE PRECEDING AND"
        " CURRENT ROW) AS o FROM src"
    )
    expected = _one_shot(
        spark, log,
        "AVG(v) OVER (PARTITION BY k ORDER BY CAST(ts AS TIMESTAMP)"
        " RANGE BETWEEN INTERVAL 5 MINUTES PRECEDING AND CURRENT ROW)",
    )
    assert _sql_replay(spark, sql, log, 3) == expected


def test_sql_over_unbounded_and_where(spark):
    log = _ts_log(spark)
    # no frame clause = UNBOUNDED PRECEDING; WHERE filters arrivals
    # BEFORE they enter any frame (SQL's evaluation order)
    sql = (
        "INSERT INTO sink SELECT id, k, v, MAX(v) OVER (PARTITION BY k"
        " ORDER BY ts) AS o FROM src WHERE v IS NOT NULL"
    )
    expected = _one_shot(
        spark, log.filter(F.col("v").isNotNull()),
        "MAX(v) OVER (PARTITION BY k ORDER BY ts, _seq"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
    )
    for n in (1, 4):
        assert _sql_replay(spark, sql, log, n) == expected


def test_sql_over_parse_rules(spark):
    from flink_cdc_2_3_0_src_spark.plans.sql_maintain import (
        parse_insert_select,
        plan_insert_maintained,
    )

    base = "INSERT INTO sink SELECT id, k, v, "
    # UNBOUNDED spelled explicitly, both frame kinds
    for fr in ("ROWS", "RANGE"):
        stmt = parse_insert_select(
            base + f"SUM(v) OVER (PARTITION BY k ORDER BY ts {fr} "
            "BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS o FROM src"
        )
        assert stmt.shape == "over"
        assert stmt.over["rows"] is None and stmt.over["range"] is None
    with pytest.raises(ValueError, match="ASCENDING time attribute"):
        parse_insert_select(
            base + "SUM(v) OVER (PARTITION BY k ORDER BY ts DESC) AS o"
            " FROM src"
        )
    with pytest.raises(ValueError, match="DISTINCT"):
        parse_insert_select(
            base + "COUNT(DISTINCT v) OVER (PARTITION BY k ORDER BY ts)"
            " AS o FROM src"
        )
    with pytest.raises(ValueError, match="must be identical"):
        parse_insert_select(
            base + "SUM(v) OVER (PARTITION BY k ORDER BY ts) AS o,"
            " COUNT(*) OVER (PARTITION BY v ORDER BY ts) AS n FROM src"
        )
    with pytest.raises(ValueError, match="duplicate output column"):
        parse_insert_select(
            base + "SUM(v) OVER (PARTITION BY k ORDER BY ts) AS o,"
            " COUNT(*) OVER (PARTITION BY k ORDER BY ts) AS o FROM src"
        )
    with pytest.raises(ValueError, match="plain source columns"):
        parse_insert_select(
            base + "v + 1, SUM(v) OVER (PARTITION BY k ORDER BY ts)"
            " AS o FROM src"
        )
    # a SELECT with no OVER item at all is the row-local calc shape
    # since r12 (formerly the generic shape error)
    st_calc = parse_insert_select("INSERT INTO sink SELECT id, k FROM src")
    assert st_calc.shape == "calc"
    # unaliased over agg gets a derived stable name
    stmt = parse_insert_select(
        base + "SUM(v) OVER (PARTITION BY k ORDER BY ts) FROM src"
    )
    assert ("sum_v" in stmt.aggs) and (None, "sum_v") in stmt.select
    # ttl must name the ORDER BY column (plan-level contract surfaces)
    with pytest.raises(ValueError, match="ORDER BY time column"):
        plan_insert_maintained(
            base + "SUM(v) OVER (PARTITION BY k ORDER BY ts ROWS"
            " BETWEEN 1 PRECEDING AND CURRENT ROW) AS o FROM src",
            {"src": ["id"]}, ttl="v",
        )


def test_sql_over_updating_input_refused(spark):
    from flink_cdc_2_3_0_src_spark.plans.sql_maintain import (
        plan_insert_maintained,
    )

    log = _ts_log(spark).withColumn(
        OP_COL, F.when(F.col("id") == 3, F.lit("-D")).otherwise("+I")
    )
    job = plan_insert_maintained(
        "INSERT INTO sink SELECT id, k, v, SUM(v) OVER (PARTITION BY k"
        " ORDER BY ts) AS o FROM src",
        {"src": ["id"]},
    )
    with pytest.raises(ValueError, match="append-only"):
        job.step({"src": log})


def test_sql_over_delta_changelog_and_ttl(spark):
    from flink_cdc_2_3_0_src_spark.plans.sql_maintain import (
        plan_insert_maintained,
    )

    log = _ts_log(spark)
    sql = (
        "INSERT INTO sink SELECT id, k, v, SUM(v) OVER (PARTITION BY k"
        " ORDER BY ts ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS o"
        " FROM src"
    )
    job = plan_insert_maintained(sql, {"src": ["id"]}, ttl="ts")
    d1 = job.step({"src": log.filter(F.col("id") <= 4)})
    cl = job.delta_changelog(d1, 0)
    got = cl.select("id", OP_COL).collect()
    assert len(got) == 4 and all(r[OP_COL] == "+I" for r in got)
    # bounded-frame state expires behind the watermark via the job
    job.expire("2024-01-01 00:29:00")
    job.step({"src": log.filter(F.col("id") > 4)})
    assert job.result().count() == 8
    # PK not projected → the changelog render refuses with guidance
    job2 = plan_insert_maintained(
        "INSERT INTO sink SELECT k, v, SUM(v) OVER (PARTITION BY k"
        " ORDER BY ts) AS o FROM src",
        {"src": ["id"]},
    )
    d = job2.step({"src": log})
    with pytest.raises(ValueError, match="PRIMARY KEY"):
        job2.delta_changelog(d, 0)


def test_sql_over_duplicate_rows_keep_multiset(spark):
    # two identical arrivals (same projected payload AND same frame
    # aggregate) are two output rows — result() keeps multiset
    # semantics like the join shapes
    from flink_cdc_2_3_0_src_spark.plans.sql_maintain import (
        plan_insert_maintained,
    )

    rows = [(1, "a", 3.0, 10), (2, "a", 3.0, 10)]
    log = spark.createDataFrame(
        rows, "id long, k string, v double, ts long"
    ).select(
        "k", "v", "ts", F.lit("+I").alias(OP_COL),
        F.col("id").alias(SEQ_COL),
    )
    job = plan_insert_maintained(
        "INSERT INTO sink SELECT k, v, MIN(v) OVER (PARTITION BY k"
        " ORDER BY ts) AS o FROM src",
        {"src": []},
    )
    job.step({"src": log})
    assert job.result().count() == 2


def test_sql_over_explain(spark):
    from flink_cdc_2_3_0_src_spark.plans.sql_maintain import (
        explain_insert_maintained,
    )

    txt = explain_insert_maintained(
        "INSERT INTO sink SELECT id, k, SUM(v) OVER (PARTITION BY k"
        " ORDER BY ts RANGE BETWEEN INTERVAL '10' MINUTE PRECEDING AND"
        " CURRENT ROW) AS o FROM src WHERE v > 0",
        {"src": ["id"]}, ttl="ts",
    )
    assert "StreamExecOverAggregate" in txt
    assert "RANGE 10 minutes PRECEDING" in txt
    assert "where:" in txt and "state ttl" in txt


def test_sql_over_lag_matches_one_shot(spark):
    """LAG(col, k) rides the ROWS frame's retained-rows state (Flink's
    LagAggFunction inside StreamExecOverAggregate): offsets resolve
    across microbatch boundaries exactly because retention keeps the
    frame-reachable rows per key."""
    from flink_cdc_2_3_0_src_spark.plans.sql_maintain import (
        replay_insert_maintained,
    )

    rows = [
        (i, ["a", "b"][i % 2], float(i * i % 17), i * 10)
        for i in range(14)
    ]
    log = spark.createDataFrame(
        rows, "id long, k string, v double, ts long"
    ).select(
        "id", "k", "v", "ts", F.lit("+I").alias(OP_COL),
        F.col("id").alias(SEQ_COL),
    )
    sql = (
        "INSERT INTO sink SELECT id, k, v, LAG(v, 2) OVER (PARTITION"
        " BY k ORDER BY ts ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"
        " AS prev2, SUM(v) OVER (PARTITION BY k ORDER BY ts ROWS"
        " BETWEEN 3 PRECEDING AND CURRENT ROW) AS s FROM src"
    )
    for n in (1, 4):
        out = replay_insert_maintained(
            sql, {"src": ["id"]}, {"src": log}, n_batches=n
        )
        got = sorted(map(tuple, out.collect()))
        log.drop(OP_COL).createOrReplaceTempView("__lag_t")
        exp = spark.sql(
            "SELECT id, k, v, LAG(v, 2) OVER w AS prev2,"
            " SUM(v) OVER (PARTITION BY k ORDER BY ts, _seq ROWS"
            " BETWEEN 3 PRECEDING AND CURRENT ROW) AS s FROM __lag_t"
            " WINDOW w AS (PARTITION BY k ORDER BY ts, _seq)"
        )
        assert got == sorted(map(tuple, exp.collect()))


def test_sql_over_lag_guards(spark):
    from flink_cdc_2_3_0_src_spark.plans.sql_maintain import (
        plan_insert_maintained,
    )

    base = (
        "INSERT INTO sink SELECT id, k, LAG(v{args}) OVER (PARTITION"
        " BY k ORDER BY ts{frame}) AS p FROM src"
    )
    rows_frame = " ROWS BETWEEN 3 PRECEDING AND CURRENT ROW"
    # no frame (UNBOUNDED) / RANGE frames cannot guarantee the offset
    # row is retained
    with pytest.raises(ValueError, match="requires a ROWS frame"):
        plan_insert_maintained(
            base.format(args=", 2", frame=""), {"src": ["id"]}
        )
    with pytest.raises(ValueError, match="requires a ROWS frame"):
        plan_insert_maintained(
            base.format(
                args=", 2",
                frame=" RANGE BETWEEN INTERVAL '5' MINUTE PRECEDING"
                " AND CURRENT ROW",
            ),
            {"src": ["id"]},
        )
    with pytest.raises(ValueError, match="exceeds the ROWS frame bound"):
        plan_insert_maintained(
            base.format(args=", 9", frame=rows_frame), {"src": ["id"]}
        )
    with pytest.raises(ValueError, match="integer k >= 1"):
        plan_insert_maintained(
            base.format(args=", 0", frame=rows_frame), {"src": ["id"]}
        )
    # bare LAG(col) defaults to offset 1
    job = plan_insert_maintained(
        base.format(args="", frame=rows_frame), {"src": ["id"]}
    )
    assert job.plan._lag["p"] == ("v", 1)


def test_sql_over_lag_expression_commas_parse(spark):
    """Advisor-fix pin: LAG argument splitting is paren-aware — a
    single-column expression containing commas (LAG(COALESCE(v, 0.0))
    with or without an explicit offset) is one argument, not a
    malformed (col, k) pair."""
    from flink_cdc_2_3_0_src_spark.plans.sql_maintain import (
        plan_insert_maintained,
        replay_insert_maintained,
    )

    base = (
        "INSERT INTO sink SELECT id, k, LAG({args}) OVER (PARTITION"
        " BY k ORDER BY ts ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)"
        " AS p FROM src"
    )
    job = plan_insert_maintained(
        base.format(args="COALESCE(v, 0.0)"), {"src": ["id"]}
    )
    assert job.plan._lag["p"] == ("COALESCE(v, 0.0)", 1)
    job = plan_insert_maintained(
        base.format(args="COALESCE(v, 0.0), 2"), {"src": ["id"]}
    )
    assert job.plan._lag["p"] == ("COALESCE(v, 0.0)", 2)
    rows = [(1, "a", None, 10), (2, "a", 2.0, 20), (3, "a", 3.0, 30)]
    log = spark.createDataFrame(
        rows, "id long, k string, v double, ts long"
    ).select(
        "id", "k", "v", "ts", F.lit("+I").alias(OP_COL),
        F.col("id").alias(SEQ_COL),
    )
    got = sorted(
        map(
            tuple,
            replay_insert_maintained(
                base.format(args="COALESCE(v, 0.0), 2"),
                {"src": ["id"]}, {"src": log}, n_batches=2,
            ).collect(),
        )
    )
    assert got == [(1, "a", None), (2, "a", None), (3, "a", 0.0)]


def test_sql_over_null_order_rows_dropped_any_split(spark):
    """Review-fix pin: NULL event times are dropped (the session/
    cumulate/dedup rule) — keeping them made frames split-variant
    (NULLS FIRST in the window vs last in the retention rank)."""
    from flink_cdc_2_3_0_src_spark.plans.sql_maintain import (
        replay_insert_maintained,
    )

    rows = [
        (1, "a", 1.0, None), (2, "a", 2.0, 10), (3, "a", 3.0, 20),
        (4, "a", 4.0, None), (5, "b", 5.0, 15),
    ]
    log = spark.createDataFrame(
        rows, "id long, k string, v double, ts long"
    ).select(
        "id", "k", "v", "ts", F.lit("+I").alias(OP_COL),
        F.col("id").alias(SEQ_COL),
    )
    sql = (
        "INSERT INTO sink SELECT id, k, v, SUM(v) OVER (PARTITION BY k"
        " ORDER BY ts ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS o"
        " FROM src"
    )
    outs = [
        sorted(
            map(
                tuple,
                replay_insert_maintained(
                    sql, {"src": ["id"]}, {"src": log}, n_batches=n
                ).collect(),
            )
        )
        for n in (1, 2, 4)
    ]
    assert outs[0] == outs[1] == outs[2]
    assert outs[0] == [
        (2, "a", 2.0, 2.0), (3, "a", 3.0, 5.0), (5, "b", 5.0, 5.0),
    ]


def test_sql_over_order_must_be_declared_rowtime(spark):
    from flink_cdc_2_3_0_src_spark.plans.sql_maintain import (
        plan_insert_maintained,
    )

    with pytest.raises(ValueError, match="declared event-time column"):
        plan_insert_maintained(
            "INSERT INTO sink SELECT id, k, SUM(v) OVER (PARTITION BY k"
            " ORDER BY v ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS o"
            " FROM src",
            {"src": {"primary_key": ["id"], "rowtime": "ts"}},
        )


def test_statement_set_reads_over_sink(spark):
    """Review-fix pin: an OVER statement projecting the source PK is a
    readable keyed table for later STATEMENT SET statements."""
    from flink_cdc_2_3_0_src_spark.plans.sql_maintain import (
        SqlStatementSet,
    )

    rows = [(i, ["a", "b"][i % 2], float(i), i * 10) for i in range(8)]
    log = spark.createDataFrame(
        rows, "id long, k string, v double, ts long"
    ).select(
        "id", "k", "v", "ts", F.lit("+I").alias(OP_COL),
        F.col("id").alias(SEQ_COL),
    )
    ss = SqlStatementSet(
        [
            "INSERT INTO enriched SELECT id, k, SUM(v) OVER (PARTITION"
            " BY k ORDER BY ts ROWS BETWEEN 1 PRECEDING AND CURRENT"
            " ROW) AS s FROM src",
            "INSERT INTO agg SELECT k, SUM(s) AS tot, COUNT(*) AS n"
            " FROM enriched GROUP BY k",
        ],
        {"src": ["id"]},
    )
    for lo, hi in ((0, 4), (4, 10)):
        ss.step({"src": log.filter(
            (F.col(SEQ_COL) >= lo) & (F.col(SEQ_COL) < hi)
        )})
    got = {r["k"]: (r["tot"], r["n"]) for r in ss.results()["agg"].collect()}
    # frame sums per key: a has v=0,2,4,6 -> s=0,2,6,10 (sum 18, 4 rows)
    # b has v=1,3,5,7 -> s=1,4,8,12 (sum 25, 4 rows)
    assert got == {"a": (18.0, 4), "b": (25.0, 4)}
