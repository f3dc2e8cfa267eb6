"""Event-time temporal join maintenance (_TemporalJoinPlan — Flink's
FOR SYSTEM_TIME AS OF over a versioned table, TemporalRowTimeJoinOperator):
each append-only probe row joins the build VERSION valid at the probe's
event time; output is append-only (never retracted when the dim changes
later — the defining difference from the regular maintained join).
Split-invariance, tombstone semantics, the append-only probe contract,
-U inertness, and the versioned TTL cleanup (keep the latest version
before the watermark) are pinned here; the SQL surface rides in
tests/test_sql_maintain.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_cdc_2_3_0_src_spark.model import OP_COL, SEQ_COL
from flink_cdc_2_3_0_src_spark.operators.maintain import maintain

COLS_B = ["k", "tier", "vts", OP_COL, SEQ_COL]
COLS_P = ["pid", "k", "pts", OP_COL, SEQ_COL]


def _dim_log(spark):
    rows = [
        # k=1: a@10 → b@30 (full-retraction update) → tombstone@50 → c@70
        (1, "a", 10, "+I", 1),
        (1, "a", 10, "-U", 5),
        (1, "b", 30, "+U", 5),
        # the version-time column carries the CHANGE's event time — a
        # -D's vts is the deletion time (when the key stops having a
        # valid image), not the old image's version time
        (1, "b", 50, "-D", 9),
        (1, "c", 70, "+I", 13),
        # k=2: one version
        (2, "x", 20, "+I", 2),
    ]
    return spark.createDataFrame(rows, COLS_B).select(
        "k", "tier", F.col("vts").cast("long").alias("vts"),
        OP_COL, F.col(SEQ_COL).cast("long").alias(SEQ_COL),
    )


def _probe_log(spark):
    rows = [
        (101, 1, 5, "+I", 3),    # before any version → no match
        (102, 1, 15, "+I", 4),   # → a
        (103, 1, 35, "+I", 6),   # → b
        (104, 2, 25, "+I", 7),   # → x
        (105, 3, 40, "+I", 8),   # key never inserted → no match
        (106, 1, 55, "+I", 10),  # tombstone valid at 50 → no match
        (107, 1, 30, "+I", 11),  # boundary: vts=30 <= pts=30 → b
        (108, 1, 75, "+I", 14),  # → c (post-tombstone re-insert)
    ]
    return spark.createDataFrame(rows, COLS_P).select(
        "pid", "k", F.col("pts").cast("long").alias("pts"),
        OP_COL, F.col(SEQ_COL).cast("long").alias(SEQ_COL),
    )


EXPECT_INNER = {
    (102, 1, 15, "a"),
    (103, 1, 35, "b"),
    (104, 2, 25, "x"),
    (107, 1, 30, "b"),
    (108, 1, 75, "c"),
}
EXPECT_LEFT = EXPECT_INNER | {
    (101, 1, 5, None),
    (105, 3, 40, None),
    (106, 1, 55, None),
}


def _seq_batches(df, n_batches):
    hi = int(df.agg(F.max(SEQ_COL)).collect()[0][0])
    out = []
    for i in range(n_batches):
        lo = i * (hi + 1) // n_batches
        up = (i + 1) * (hi + 1) // n_batches
        out.append(
            df.filter((F.col(SEQ_COL) >= lo) & (F.col(SEQ_COL) < up))
        )
    return out


def _replay(spark, how, n_batches):
    plan = maintain(temporal={"on": ["k"], "ptime": "pts",
                              "btime": "vts", "how": how})
    dim, probe = _dim_log(spark), _probe_log(spark)
    state, rows = None, []
    for bp, bb in zip(
        _seq_batches(probe, n_batches), _seq_batches(dim, n_batches)
    ):
        state, out = plan.step(state, bp, bb)
        # the build side's version time rides along as payload (the
        # version's valid-from — projectable like any dim column)
        assert set(out.columns) == {
            "pid", "k", "pts", "tier", "vts", "__mult"
        }
        got = out.collect()
        assert all(r["__mult"] == 1 for r in got)  # append-only output
        rows.extend((r["pid"], r["k"], r["pts"], r["tier"]) for r in got)
    assert len(rows) == len(set(rows))
    return state, set(rows)


@pytest.mark.parametrize("n_batches", [1, 2, 4])
def test_temporal_inner_split_invariance(spark, n_batches):
    _, got = _replay(spark, "inner", n_batches)
    assert got == EXPECT_INNER


@pytest.mark.parametrize("n_batches", [1, 3])
def test_temporal_left_split_invariance(spark, n_batches):
    _, got = _replay(spark, "left", n_batches)
    assert got == EXPECT_LEFT


def test_temporal_probe_must_be_append_only(spark):
    plan = maintain(temporal={"on": ["k"], "ptime": "pts", "btime": "vts"})
    bad = spark.createDataFrame(
        [(101, 1, 5, "+I", 1), (101, 1, 5, "-D", 2)], COLS_P
    )
    dim = _dim_log(spark)
    with pytest.raises(ValueError, match="append-only"):
        plan.step(None, bad, dim)


def test_temporal_null_version_time_dropped_and_u_before_inert(spark):
    # a build row with NULL version time is dropped (a version needs an
    # event time); lone -U rows are inert (the boundary is the paired
    # +U/-D) — neither may open or close a version
    plan = maintain(temporal={"on": ["k"], "ptime": "pts", "btime": "vts"})
    dim = spark.createDataFrame(
        [(1, "a", 10, "+I", 1), (1, "zz", None, "+U", 2),
         (2, "ghost", 5, "-U", 3)],
        COLS_B,
    ).select("k", "tier", F.col("vts").cast("long").alias("vts"),
             OP_COL, F.col(SEQ_COL).cast("long").alias(SEQ_COL))
    probe = spark.createDataFrame(
        [(201, 1, 50, "+I", 4), (202, 2, 50, "+I", 5)], COLS_P
    )
    _, out = plan.step(None, probe, dim)
    got = {(r["pid"], r["tier"]) for r in out.collect()}
    assert got == {(201, "a")}


def test_temporal_expire_keeps_latest_version_before_watermark(spark):
    plan = maintain(
        temporal={"on": ["k"], "ptime": "pts", "btime": "vts"},
        ttl="vts",
    )
    dim, probe = _dim_log(spark), _probe_log(spark)
    state, _ = plan.step(None, probe, dim)
    state = plan.expire(state, 60).localCheckpoint(eager=True)
    kept = {(r["k"], r["tier"], r["vts"], r["__alive"])
            for r in state.collect()}
    # k=1 keeps vts=70 (>= wm) plus the latest before 60 = the
    # tombstone at 50; k=2 keeps its only version (latest before wm)
    assert kept == {
        (1, "c", 70, 1),
        (1, "b", 50, 0),   # the -D carries the old image; alive=0
        (2, "x", 20, 1),
    }
    # post-expiry probes inside the retention window stay exact ...
    late = spark.createDataFrame(
        [(301, 1, 80, "+I", 20), (302, 1, 62, "+I", 21),
         (303, 2, 65, "+I", 22)],
        COLS_P,
    )
    empty_dim = dim.limit(0)
    state, out = plan.step(state, late, empty_dim)
    got = {(r["pid"], r["tier"]) for r in out.collect()}
    assert got == {(301, "c"), (303, "x")}  # 302: tombstone at 50 wins
    # ... while a probe OLDER than the watermark sees only the kept
    # snapshot (the retention trade — Flink's state cleanup makes the
    # same one): version b@30 was evicted, so pts=35 finds nothing
    stale = spark.createDataFrame([(304, 1, 35, "+I", 23)], COLS_P)
    _, out2 = plan.step(state, stale, empty_dim)
    assert out2.count() == 0


def test_temporal_dispatch_errors(spark):
    with pytest.raises(ValueError, match="inner or left"):
        maintain(temporal={"on": ["k"], "ptime": "p", "btime": "b",
                           "how": "full"})
    with pytest.raises(ValueError, match="needs"):
        maintain(temporal={"on": ["k"], "ptime": "p"})
    with pytest.raises(ValueError, match="unknown temporal options"):
        maintain(temporal={"on": ["k"], "ptime": "p", "btime": "b",
                           "bogus": 1})
    with pytest.raises(ValueError, match="version-time column"):
        maintain(temporal={"on": ["k"], "ptime": "p", "btime": "b"},
                 ttl="p")
    with pytest.raises(ValueError, match="options dict"):
        maintain(temporal=True)
    plan = maintain(temporal={"on": ["k"], "ptime": "p", "btime": "b"})
    with pytest.raises(ValueError, match="two batches"):
        plan.step(None, _probe_log(spark))


def test_temporal_non_key_column_clash_raises(spark):
    plan = maintain(temporal={"on": ["k"], "ptime": "pts", "btime": "vts"})
    dim = _dim_log(spark).withColumnRenamed("tier", "pts2")
    probe = _probe_log(spark).withColumnRenamed("pid", "pts2")
    with pytest.raises(ValueError, match="share non-key column"):
        plan.step(None, probe, dim)


# ---- SQL surface: FOR SYSTEM_TIME AS OF --------------------------------

from flink_cdc_2_3_0_src_spark.plans.sql_maintain import (  # noqa: E402
    SqlStatementSet,
    explain_insert_maintained,
    parse_insert_select,
    plan_insert_maintained,
    replay_insert_maintained,
)

_TJ_SQL = (
    "INSERT INTO sink SELECT p.pid, p.pts, p.k, d.tier "
    "FROM probe p JOIN dim FOR SYSTEM_TIME AS OF p.pts AS d "
    "ON p.k = d.k"
)
_TJ_TABLES = {
    "probe": ["pid"],
    "dim": {"primary_key": ["k"], "rowtime": "vts"},
}


def test_parse_temporal_shape():
    st = parse_insert_select(_TJ_SQL)
    assert st.shape == "temporal"
    assert st.sources == ["probe", "dim"]
    assert st.temporal == ("p", "pts", "d")
    assert st.join_how == "inner"
    assert st.join_on == [("k", "k")]
    st2 = parse_insert_select(_TJ_SQL.replace("JOIN dim", "LEFT JOIN dim"))
    assert st2.join_how == "left"


@pytest.mark.parametrize(
    "sql,msg",
    [
        (_TJ_SQL.replace("JOIN dim", "RIGHT JOIN dim"),
         "INNER and LEFT only"),
        (_TJ_SQL.replace("AS OF p.pts", "AS OF x.pts"),
         "probe .first. table's alias"),
        (_TJ_SQL + " AND p.pts < d.vts", "equi conditions only"),
        (_TJ_SQL + " JOIN other o ON o.k = p.k", "only join"),
        ("INSERT INTO sink SELECT a.x, d.y FROM ta a JOIN tb b "
         "ON a.k = b.k JOIN dim FOR SYSTEM_TIME AS OF a.ts AS d "
         "ON a.k = d.k", "only join"),
    ],
)
def test_parse_temporal_errors(sql, msg):
    with pytest.raises(ValueError, match=msg):
        parse_insert_select(sql)


@pytest.mark.parametrize(
    "tables,msg",
    [
        ({"probe": ["pid"], "dim": ["k"]}, "declared event-time"),
        ({"probe": ["pid"], "dim": {"primary_key": ["k", "k2"],
                                    "rowtime": "vts"}},
         "full PRIMARY KEY"),
        ({"probe": ["pid"], "dim": {"primary_key": ["k"],
                                    "rowtime": "k"}},
         "cannot be a join key"),
        ({"probe": ["pid"], "dim": {"primary_key": [],
                                    "rowtime": "vts"}},
         "needs a PRIMARY KEY"),
    ],
)
def test_temporal_plan_registration_errors(spark, tables, msg):
    with pytest.raises(ValueError, match=msg):
        plan_insert_maintained(_TJ_SQL, tables)


def test_temporal_left_padded_key_projects_sql_null(spark):
    """r11 (formerly refused): projecting the versioned side's join
    column on a LEFT temporal join emits SQL NULL on unmatched probe
    rows (Flink's semantics) via the presence-marker projection."""
    out = replay_insert_maintained(
        "INSERT INTO sink SELECT p.pid, p.pts, d.k AS dk, d.tier "
        "FROM probe p "
        "LEFT JOIN dim FOR SYSTEM_TIME AS OF p.pts AS d ON p.k = d.k",
        _TJ_TABLES,
        {"probe": _probe_log(spark), "dim": _dim_log(spark)},
        n_batches=3,
    )
    got = {(r["pid"], r["dk"], r["pts"], r["tier"]) for r in out.collect()}
    exp = {
        (pid, None if tier is None else k, pts, tier)
        for pid, k, pts, tier in EXPECT_LEFT
    }
    assert got == exp


@pytest.mark.parametrize("n_batches", [1, 3])
def test_sql_temporal_replay_inner(spark, n_batches):
    out = replay_insert_maintained(
        _TJ_SQL, _TJ_TABLES,
        {"probe": _probe_log(spark), "dim": _dim_log(spark)},
        n_batches=n_batches,
    )
    assert set(out.columns) == {"pid", "pts", "k", "tier"}
    got = {(r["pid"], r["k"], r["pts"], r["tier"]) for r in out.collect()}
    assert got == EXPECT_INNER


@pytest.mark.parametrize("n_batches", [1, 4])
def test_sql_temporal_replay_left(spark, n_batches):
    out = replay_insert_maintained(
        _TJ_SQL.replace("JOIN dim", "LEFT JOIN dim"), _TJ_TABLES,
        {"probe": _probe_log(spark), "dim": _dim_log(spark)},
        n_batches=n_batches,
    )
    got = {(r["pid"], r["k"], r["pts"], r["tier"]) for r in out.collect()}
    assert got == EXPECT_LEFT


def test_sql_temporal_explain(spark):
    txt = explain_insert_maintained(_TJ_SQL, _TJ_TABLES)
    assert "TemporalRowTimeJoinOperator" in txt
    assert "as of: p.pts" in txt
    assert "shape: temporal" in txt


def test_sql_temporal_feeds_statement_set(spark):
    # enrich → aggregate: the temporal sink projects the probe PK, so
    # it is a readable keyed table for the downstream statement
    # (delta_changelog renders its append-only +I stream)
    sset = SqlStatementSet(
        [
            _TJ_SQL.replace("INTO sink", "INTO enriched"),
            "INSERT INTO by_tier SELECT tier, COUNT(*) AS n "
            "FROM enriched GROUP BY tier",
        ],
        _TJ_TABLES,
    )
    assert sset.external == ["dim", "probe"]
    probe, dim = _probe_log(spark), _dim_log(spark)
    for bp, bb in zip(_seq_batches(probe, 3), _seq_batches(dim, 3)):
        sset.step({"probe": bp, "dim": bb})
    res = sset.results()
    tiers = {(r["tier"], r["n"]) for r in res["by_tier"].collect()}
    # EXPECT_INNER tiers: a×1, b×2, x×1, c×1
    assert tiers == {("a", 1), ("b", 2), ("x", 1), ("c", 1)}
    enriched = {(r["pid"], r["tier"]) for r in res["enriched"].collect()}
    assert enriched == {(p, t) for p, _, _, t in EXPECT_INNER}


def test_streaming_temporal_join_matches_expected(spark, tmp_path):
    """The temporal join through a REAL Structured Streaming query:
    probe + versioned-dim changelogs multiplex one replay stream (the
    family's witness harness), each microbatch steps the job once, and
    the final sink equals the version-valid enrichment — including the
    tombstone window and the post-tombstone re-insert."""
    from flink_cdc_2_3_0_src_spark.streaming.replay import (
        read_replay_stream,
        write_replay_files,
    )

    probe, dim = _probe_log(spark), _dim_log(spark)
    mux = probe.select(
        F.lit("p").alias("side"), "pid", "k", "pts",
        F.lit(None).cast("string").alias("tier"),
        F.lit(None).cast("long").alias("vts"),
        OP_COL, SEQ_COL,
    ).unionByName(
        dim.select(
            F.lit("d").alias("side"),
            F.lit(None).cast("long").alias("pid"), "k",
            F.lit(None).cast("long").alias("pts"), "tier", "vts",
            OP_COL, SEQ_COL,
        )
    )
    replay_dir = str(tmp_path / "replay_temporal")
    write_replay_files(mux, replay_dir, n_files=3)

    job = plan_insert_maintained(_TJ_SQL, _TJ_TABLES)

    def process(batch_df, batch_id):
        job.step(
            {
                "probe": batch_df.filter(F.col("side") == "p").select(
                    "pid", "k", "pts", OP_COL, SEQ_COL
                ),
                "dim": batch_df.filter(F.col("side") == "d").select(
                    "k", "tier", "vts", OP_COL, SEQ_COL
                ),
            }
        )

    q = (
        read_replay_stream(spark, replay_dir, mux.schema)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", str(tmp_path / "ckpt_temporal"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["pid"], r["k"], r["pts"], r["tier"])
        for r in job.result().collect()
    }
    assert got == EXPECT_INNER
