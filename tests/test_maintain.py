"""maintain() planner: query shape → maintenance plan dispatch, with
each plan's accumulated signed output deltas telescoping to the direct
one-shot result for any batch split (reusing the family's
split-invariance fixtures), plus TTL wiring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_cdc_2_3_0_src_spark.model import OP_COL, SEQ_COL
from flink_cdc_2_3_0_src_spark.operators.maintain import maintain
from flink_cdc_2_3_0_src_spark.sources.scripted_log import scripted_changelog
from tests.conftest import SF_SMOKE


def _net(parts):
    """Accumulate signed delta rows → set of live result rows."""
    net = {}
    for row in parts:
        t = tuple(row)
        key, mult = t[:-1], t[-1]
        net[key] = net.get(key, 0) + mult
    return {k for k, m in net.items() if m > 0}


def _seq_batches(df, n_batches):
    hi = df.agg(F.max(SEQ_COL)).collect()[0][0]
    out = []
    for i in range(n_batches):
        lo_edge = i * (int(hi) + 1) // n_batches
        hi_edge = (i + 1) * (int(hi) + 1) // n_batches
        cond = (F.col(SEQ_COL) >= lo_edge) & (F.col(SEQ_COL) < hi_edge)
        if i == 0:
            cond = F.col(SEQ_COL) < hi_edge
        if i == n_batches - 1:
            cond = F.col(SEQ_COL) >= lo_edge if n_batches > 1 else F.lit(True)
        out.append(df.filter(cond))
    return out


def _run_plan(plan, batches):
    state, parts = None, []
    for b in batches:
        state, out = plan.step(state, b)
        if isinstance(state, tuple):
            state = tuple(s.localCheckpoint(eager=True) for s in state)
        else:
            state = state.localCheckpoint(eager=True)
        parts.extend(tuple(r) for r in out.collect())
    return state, parts


def test_maintain_dispatch_shapes_and_errors(spark):
    assert maintain(aggs={"s": ("sum", F.col("v"))}, group_cols=["g"]).kind == "agg"
    assert maintain(on=["k"], how="left").kind == "join"
    assert maintain(
        keys=["k"], group_cols=["g"], order_sql="v DESC, k", n=2
    ).kind == "topn"

    with pytest.raises(ValueError, match="exactly one shape"):
        maintain(aggs={"s": ("sum", F.col("v"))}, group_cols=["g"], on=["k"])
    with pytest.raises(ValueError, match="exactly one shape"):
        maintain()
    with pytest.raises(ValueError, match="group_cols"):
        maintain(aggs={"s": ("sum", F.col("v"))})
    with pytest.raises(ValueError, match="unsupported aggregate"):
        maintain(aggs={"s": ("median", F.col("v"))}, group_cols=["g"])
    # r11: min/max WITHOUT keys= routes to the value-multiset retract
    # plan (Flink's Min/MaxWithRetractAggFunction state) instead of
    # refusing — PK-keyed table state stays the strategy when keys=
    # is given
    from flink_cdc_2_3_0_src_spark.operators.maintain import (
        _AggRecomputePlan,
        _DistinctAggPlan,
    )

    assert isinstance(
        maintain(aggs={"m": ("max", F.col("v"))}, group_cols=["g"]),
        _DistinctAggPlan,
    )
    assert isinstance(
        maintain(
            aggs={"m": ("max", F.col("v"))}, group_cols=["g"], keys=["k"]
        ),
        _AggRecomputePlan,
    )
    with pytest.raises(ValueError, match="order_sql"):
        maintain(keys=["k"], group_cols=["g"], n=2)
    with pytest.raises(ValueError, match="how must be"):
        maintain(on=["k"], how="cross")
    with pytest.raises(ValueError, match="ts_col_a, ts_col_b"):
        maintain(on=["k"], ttl="ts")


def test_maintain_agg_delta_equals_agg_auto_any_split(spark):
    """sum/count/avg get the stateless signed-delta plan; accumulated
    output deltas telescope to agg_auto's one-shot result for every
    batch split."""
    from flink_cdc_2_3_0_src_spark.operators.changelog import (
        agg_auto,
        normalize_upsert,
    )

    log = scripted_changelog(spark, SF_SMOKE)
    norm = normalize_upsert(log, ["user_id"]).withColumn(
        "bucket", F.col("user_id") % 4
    )
    aggs = {
        "total": ("sum", F.col("value").cast("decimal(18,2)")),
        "n": ("count", F.col("value")),
        "mean": ("avg", F.col("value").cast("decimal(18,2)")),
    }
    direct = agg_auto(norm, ["user_id"], ["bucket"], aggs)
    want = {
        (r["bucket"], str(r["total"]), r["n"], r["mean"])
        for r in direct.collect()
    }
    assert len(want) == 4
    for nb in (1, 3):
        plan = maintain(aggs=aggs, group_cols=["bucket"])
        state, parts = _run_plan(plan, _seq_batches(norm, nb))
        got = {
            (b, str(t), n, m) for (b, t, n, m) in _net(parts)
        }
        assert got == want, f"n_batches={nb}"


def test_maintain_agg_recompute_minmax_equals_direct(spark):
    """Any min/max switches to the table-state + affected-group
    recompute plan; result equals aggregating the materialized log."""
    from flink_cdc_2_3_0_src_spark.operators.changelog import (
        materialize,
        normalize_upsert,
    )

    log = scripted_changelog(spark, SF_SMOKE)
    norm = normalize_upsert(log, ["user_id"]).withColumn(
        "bucket", F.col("user_id") % 4
    )
    aggs = {
        "hi": ("max", F.col("value")),
        "lo": ("min", F.col("value")),
        "total": ("sum", F.col("value").cast("decimal(18,2)")),
    }
    plan = maintain(keys=["user_id"], group_cols=["bucket"], aggs=aggs)
    assert type(plan).__name__ == "_AggRecomputePlan"
    direct = (
        materialize(norm, ["user_id"])
        .groupBy("bucket")
        .agg(
            F.max("value").alias("hi"),
            F.min("value").alias("lo"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total"),
        )
    )
    want = {
        (r["bucket"], r["hi"], r["lo"], str(r["total"]))
        for r in direct.collect()
    }
    for nb in (1, 3):
        state, parts = _run_plan(plan, _seq_batches(norm, nb))
        got = {(b, h, lo, str(t)) for (b, h, lo, t) in _net(parts)}
        assert got == want, f"n_batches={nb}"
        # final agg state equals the net output too
        final = {
            (r["bucket"], r["hi"], r["lo"], str(r["total"]))
            for r in state[1].collect()
        }
        assert final == want


def test_maintain_join_plan_matches_direct_join(spark):
    from flink_cdc_2_3_0_src_spark.operators.changelog import materialize

    a = spark.createDataFrame(
        [(1, "a1", "+I", 1), (2, "b1", "+I", 2), (1, "a1", "-U", 5),
         (1, "a2", "+U", 5), (3, "c1", "+I", 6), (2, "b1", "-D", 9)],
        f"user_id long, v string, {OP_COL} string, {SEQ_COL} long",
    )
    b = spark.createDataFrame(
        [(1, "gold", "+I", 3), (2, "iron", "+I", 4), (3, "tin", "+I", 7),
         (3, "tin", "-U", 8), (3, "zinc", "+U", 8), (1, "gold", "-D", 10)],
        f"user_id long, seg string, {OP_COL} string, {SEQ_COL} long",
    )
    direct = {
        tuple(r)
        for r in materialize(a, ["user_id"])
        .join(materialize(b, ["user_id"]), "user_id")
        .collect()
    }
    for nb in (1, 4):
        plan = maintain(on=["user_id"])
        state, parts = None, []
        for ba, bb in zip(_seq_batches(a, nb), _seq_batches(b, nb)):
            state, out = plan.step(state, ba, bb)
            state = tuple(s.localCheckpoint(eager=True) for s in state)
            parts.extend(tuple(r) for r in out.collect())
        assert _net(parts) == direct == {(3, "c1", "zinc")}, f"nb={nb}"


def test_maintain_topn_plan_matches_direct_rank(spark):
    from pyspark.sql.window import Window as W

    from flink_cdc_2_3_0_src_spark.operators.changelog import materialize

    rows = [
        (0, 0, 10.0, "+I", 1), (0, 2, 20.0, "+I", 2), (0, 4, 5.0, "+I", 3),
        (0, 4, 5.0, "-U", 7), (0, 4, 50.0, "+U", 7), (0, 2, 20.0, "-D", 9),
        (1, 1, 7.0, "+I", 4), (1, 3, 3.0, "+I", 5),
    ]
    log = spark.createDataFrame(
        rows,
        f"bucket long, user_id long, value double, {OP_COL} string, {SEQ_COL} long",
    )
    direct = {
        tuple(r)
        for r in materialize(log, ["user_id"])
        .withColumn(
            "__rn",
            F.row_number().over(
                W.partitionBy("bucket").orderBy(
                    F.col("value").desc(), F.col("user_id")
                )
            ),
        )
        .filter(F.col("__rn") <= 2)
        .select("bucket", "user_id", "value")
        .collect()
    }
    for nb in (1, 3):
        plan = maintain(
            keys=["user_id"], group_cols=["bucket"],
            order_sql="value DESC, user_id", n=2,
        )
        state, parts = _run_plan(plan, _seq_batches(log, nb))
        assert _net(parts) == direct, f"nb={nb}"
        final = {
            (r["bucket"], r["user_id"], r["value"])
            for r in state[1].collect()
        }
        assert final == direct


def test_maintain_agg_plan_ignores_control_rows(spark):
    """+H/+S rows must not inflate live-row counts or surface ghost
    groups in either agg plan."""
    rows = [
        (0, 10.0, "+I", 1),
        (None, None, "+H", 2),
        (None, None, "+S", 3),
        (1, 4.0, "+I", 4),
    ]
    batch = spark.createDataFrame(
        rows, f"bucket long, value double, {OP_COL} string, {SEQ_COL} long"
    )
    plan = maintain(
        aggs={"n": ("count", F.col("value")),
              "total": ("sum", F.col("value").cast("decimal(18,2)"))},
        group_cols=["bucket"],
    )
    state, out = plan.step(None, batch)
    got = {(r["bucket"], r["n"], str(r["total"]), r["__mult"])
           for r in out.collect()}
    assert got == {(0, 1, "10.00", 1), (1, 1, "4.00", 1)}


def test_maintain_ttl_wiring(spark):
    """plan.expire evicts behind-watermark state in every plan's state
    shape; unset ttl raises; agg ttl must be a group column."""
    # join: per-side ts columns
    jp = maintain(on=["k"], ttl=("ts_a", "ts_b"))
    a_st = spark.createDataFrame(
        [(1, 100, 1), (2, 900, 1)], "k long, ts_a long, __mult long"
    )
    b_st = spark.createDataFrame(
        [(1, 110, 1), (2, 910, 1)], "k long, ts_b long, __mult long"
    )
    ea, eb = jp.expire((a_st, b_st), 500)
    assert {r["k"] for r in ea.collect()} == {2}
    assert {r["k"] for r in eb.collect()} == {2}

    # topn: both table and membership state
    tp = maintain(
        keys=["k"], group_cols=["g"], order_sql="v DESC, k", n=1, ttl="ts"
    )
    t_st = spark.createDataFrame(
        [(0, 1, 1.0, 100), (1, 2, 2.0, 900)], "g long, k long, v double, ts long"
    )
    et, em = tp.expire((t_st, t_st), 500)
    assert {r["g"] for r in et.collect()} == {1}
    assert {r["g"] for r in em.collect()} == {1}

    # agg: bucket-as-group TTL (the windowed-agg composition)
    ap = maintain(
        aggs={"s": ("sum", F.col("v").cast("decimal(18,2)"))},
        group_cols=["day"], ttl="day",
    )
    a_state = spark.createDataFrame(
        [(100, "1.00", 1), (900, "2.00", 1)],
        "day long, __s_s string, __rows long",
    )
    kept = ap.expire(a_state, 500)
    assert {r["day"] for r in kept.collect()} == {900}

    # errors
    with pytest.raises(ValueError, match="no ttl configured"):
        maintain(on=["k"]).expire((a_st, b_st), 500)
    bad = maintain(
        aggs={"s": ("sum", F.col("v"))}, group_cols=["g"], ttl="ts"
    )
    with pytest.raises(ValueError, match="not a group column"):
        bad.expire(a_state, 500)


def test_maintain_dedup_plan_matches_merge_neardup(spark):
    """dedup= completes the planner's coverage of the family: the plan
    wraps merge_neardup_state (ascending doc_id batches probing the
    seen corpus's bucket state) and emits kept rows as +1 inserts."""
    def docs(rows):
        return spark.createDataFrame(
            rows,
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint",
        )

    t = "the quick brown fox jumps over the lazy dog again and again"
    plan = maintain(dedup=True)
    assert plan.kind == "dedup"
    state, out1 = plan.step(
        None,
        docs([(1, t, "en", "s", 1),
              (2, "completely different words all over this text body",
               "en", "s", 1)]),
    )
    assert {(r["doc_id"], r["__mult"]) for r in out1.collect()} == {
        (1, 1), (2, 1)
    }
    state = tuple(s.localCheckpoint(eager=True) for s in state)
    state, out2 = plan.step(
        state,
        docs([(3, t, "en", "s", 1),            # dup of seen doc 1
              (4, "brand new content nothing like the others in any "
                  "way at all", "en", "s", 1)]),
    )
    assert {(r["doc_id"], r["__mult"]) for r in out2.collect()} == {(4, 1)}

    with pytest.raises(ValueError, match="ttl is not supported"):
        maintain(dedup=True, ttl="ts")
    with pytest.raises(ValueError, match="unknown dedup options"):
        maintain(dedup={"bandz": 3})
    with pytest.raises(ValueError, match="exactly one shape"):
        maintain(dedup=True, on=["k"])


def test_maintain_agg_plan_streaming_with_bucket_ttl(spark, tmp_path):
    """The windowed-agg maintenance composition in the REAL engine:
    maintain(aggs=..., group_cols=[day bucket], ttl='day') driven by a
    Structured Streaming foreachBatch with eviction active between
    steps.  Accumulated deltas telescope to the full direct aggregate
    (eviction forgets state, it does not retract emitted results);
    final state holds only in-window buckets."""
    from flink_cdc_2_3_0_src_spark.streaming.replay import (
        read_replay_stream,
        write_replay_files,
    )

    RETENTION = 2
    rows = [
        # day 10: two users, one later update
        (10, 1, 5.0, "+I", 1), (10, 2, 7.0, "+I", 2),
        (10, 1, 5.0, "-U", 3), (10, 1, 6.0, "+U", 3),
        # day 11
        (11, 3, 9.0, "+I", 4),
        # day 14-15: far enough ahead that day 10/11 expire
        (14, 4, 1.0, "+I", 5), (15, 5, 2.0, "+I", 6),
    ]
    schema = (
        f"day long, user_id long, value double, {OP_COL} string, "
        f"{SEQ_COL} long"
    )
    log = spark.createDataFrame(rows, schema)
    replay_dir = str(tmp_path / "replay_agg_ttl")
    write_replay_files(log, replay_dir, n_files=3)

    aggs = {
        "total": ("sum", F.col("value").cast("decimal(18,2)")),
        "n": ("count", F.col("value")),
    }
    plan = maintain(aggs=aggs, group_cols=["day"], ttl="day")
    state_box, parts, max_day = [None], [], [None]

    def process(batch_df, batch_id):
        state, out = plan.step(state_box[0], batch_df)
        parts.extend(tuple(r) for r in out.collect())
        hi = batch_df.agg(F.max("day")).collect()[0][0]
        if hi is not None:
            max_day[0] = max(max_day[0] or hi, hi)
        wm = (max_day[0] or 0) - RETENTION
        state_box[0] = plan.expire(state, wm).localCheckpoint(eager=True)

    stream = read_replay_stream(spark, replay_dir, log.schema)
    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", str(tmp_path / "ckpt_agg_ttl"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)

    got = {(d, str(t), n) for (d, t, n) in _net(parts)}
    assert got == {
        (10, "13.00", 2), (11, "9.00", 1), (14, "1.00", 1), (15, "2.00", 1)
    }
    # bounded state: only buckets at or past the final watermark (13)
    assert {r["day"] for r in state_box[0].collect()} == {14, 15}


@pytest.mark.slow
def test_maintain_agg_fuzz_vs_python_reference(spark):
    """Randomized (seeded) upsert logs through batch splits: BOTH agg
    plans' accumulated deltas AND final state equal a pure-Python
    replay reference.  Integer values keep every comparison exact.
    Exercises updates, deletes, re-inserts, group-moving updates (the
    -U/+U pair straddles buckets via uid-keyed bucket), and groups
    that empty out entirely."""
    import random

    rng = random.Random(0xBEEF9)
    for trial in range(3):
        live = {}
        rows = []
        for seq in range(1, rng.randint(12, 36)):
            uid = rng.randrange(8)
            bucket = uid % 3
            if uid in live and rng.random() < 0.3:
                rows.append((bucket, uid, live[uid], "-D", seq))
                del live[uid]
            else:
                v = rng.randrange(100)
                if uid in live:
                    rows.append((bucket, uid, live[uid], "-U", seq))
                    rows.append((bucket, uid, v, "+U", seq))
                else:
                    rows.append((bucket, uid, v, "+I", seq))
                live[uid] = v
        log = spark.createDataFrame(
            rows,
            f"bucket long, user_id long, value long, {OP_COL} string, {SEQ_COL} long",
        )
        # python reference over the live table
        by_bucket = {}
        for uid, v in live.items():
            by_bucket.setdefault(uid % 3, []).append(v)
        want = {
            (b, sum(vs), len(vs), max(vs), min(vs))
            for b, vs in by_bucket.items()
        }

        delta_plan = maintain(
            aggs={"total": ("sum", F.col("value")),
                  "n": ("count", F.col("value"))},
            group_cols=["bucket"],
        )
        rec_plan = maintain(
            keys=["user_id"], group_cols=["bucket"],
            aggs={"total": ("sum", F.col("value")),
                  "n": ("count", F.col("value")),
                  "hi": ("max", F.col("value")),
                  "lo": ("min", F.col("value"))},
        )
        for nb in (1, 3):
            _, parts = _run_plan(delta_plan, _seq_batches(log, nb))
            got = _net(parts)
            assert got == {(b, s, n) for (b, s, n, _h, _l) in want}, (
                f"delta plan trial={trial} nb={nb}"
            )
            state, parts = _run_plan(rec_plan, _seq_batches(log, nb))
            got = _net(parts)
            assert got == want, f"recompute plan trial={trial} nb={nb}"
            final = {
                (r["bucket"], r["total"], r["n"], r["hi"], r["lo"])
                for r in state[1].collect()
            }
            assert final == want, f"recompute state trial={trial} nb={nb}"


def test_maintain_hll_plan_matches_one_shot(spark):
    """hll= shape: net signed deltas of finalized estimates equal the
    one-shot hll_distinct over the union, for any split (the register
    MIN monoid), with batch-affected-only output per step."""
    from flink_cdc_2_3_0_src_spark.io import load_table
    from flink_cdc_2_3_0_src_spark.operators.sketch import hll_distinct

    docs = load_table(spark, SF_SMOKE, "documents")
    want = {tuple(r) for r in hll_distinct(docs).collect()}
    assert want
    hi = docs.agg(F.max("doc_id")).collect()[0][0]
    plan = maintain(hll=True)
    assert plan.kind == "hll"
    for nb in (1, 3):
        batches = []
        for i in range(nb):
            lo = i * (int(hi) + 1) // nb
            up = (i + 1) * (int(hi) + 1) // nb
            cond = (F.col("doc_id") >= lo) & (F.col("doc_id") < up)
            if i == nb - 1:
                cond = F.col("doc_id") >= lo if nb > 1 else F.lit(True)
            batches.append(docs.filter(cond))
        state, parts = _run_plan(plan, batches)
        assert _net(parts) == want, f"n_batches={nb}"

    with pytest.raises(ValueError, match="unknown hll options"):
        maintain(hll={"em": 64})
    with pytest.raises(ValueError, match="group column"):
        maintain(hll=True, ttl="ts").expire(state, 0)


def test_maintain_hist_plan_matches_one_shot(spark):
    """hist= shape (r10, completes the sketch trio): net signed deltas
    of finalized quantile rows equal the one-shot histogram_quantiles
    over the union, for any split (the cell-count addition monoid with
    a fixed declared domain), with batch-affected-only output per
    step."""
    from flink_cdc_2_3_0_src_spark.io import load_table
    from flink_cdc_2_3_0_src_spark.operators.sketch import (
        docs_token_counts,
        histogram_quantiles,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    want = {tuple(r) for r in histogram_quantiles(docs).collect()}
    assert want
    lo_hi = docs_token_counts(docs).agg(F.min("v"), F.max("v")).collect()[0]
    vmin, vmax = int(lo_hi[0]), int(lo_hi[1])
    hi = docs.agg(F.max("doc_id")).collect()[0][0]
    plan = maintain(hist={"vmin": vmin, "vmax": vmax})
    assert plan.kind == "hist"
    for nb in (1, 3):
        batches = []
        for i in range(nb):
            lo = i * (int(hi) + 1) // nb
            up = (i + 1) * (int(hi) + 1) // nb
            cond = (F.col("doc_id") >= lo) & (F.col("doc_id") < up)
            if i == nb - 1:
                cond = F.col("doc_id") >= lo if nb > 1 else F.lit(True)
            batches.append(docs.filter(cond))
        state, parts = _run_plan(plan, batches)
        assert _net(parts) == want, f"n_batches={nb}"

    with pytest.raises(ValueError, match="declared domain"):
        maintain(hist=True)
    with pytest.raises(ValueError, match="unknown hist options"):
        maintain(hist={"vmin": 0, "vmax": 9, "m": 64})
    with pytest.raises(ValueError, match="takes True or an options dict"):
        maintain(hist=[1, 2])
    # hist=False reads as "not this shape", not dict(False)
    with pytest.raises(ValueError, match="exactly one shape"):
        maintain(hist=False)
    with pytest.raises(ValueError, match="group column"):
        maintain(hist={"vmin": vmin, "vmax": vmax}, ttl="ts").expire(state, 0)


def test_maintain_session_dispatch_and_guards(spark):
    aggs = {"s": ("sum", F.col("v"))}
    plan = maintain(
        aggs=aggs, group_cols=["g"], keys=["k"], session=("ts", "2 hours")
    )
    assert plan.kind == "session"
    with pytest.raises(ValueError, match="modifier of the aggregate"):
        maintain(on=["k"], session=("ts", "2 hours"))
    with pytest.raises(ValueError, match="keys="):
        maintain(aggs=aggs, group_cols=["g"], session=("ts", "2 hours"))
    with pytest.raises(ValueError, match="session gap"):
        maintain(
            aggs=aggs, group_cols=["g"], keys=["k"],
            session=("ts", "2 fortnights"),
        )
    with pytest.raises(ValueError, match="collide with group"):
        maintain(
            aggs=aggs, group_cols=["w_start"], keys=["k"],
            session=("ts", "2 hours"),
        )
    with pytest.raises(ValueError, match="session ttl"):
        maintain(
            aggs=aggs, group_cols=["g"], keys=["k"],
            session=("ts", "2 hours"), ttl="g",
        )
    with pytest.raises(ValueError, match="unknown session options"):
        maintain(
            aggs=aggs, group_cols=["g"], keys=["k"],
            session={"ts": "ts", "gap": "1 hour", "bogus": 1},
        )


def test_maintain_global_session_no_group_cols(spark):
    """GROUP BY SESSION(..) alone (no key columns): one global session
    timeline; split-invariant and equal to one-shot sessionization."""
    from datetime import datetime as dt

    from flink_cdc_2_3_0_src_spark.operators.changelog import materialize

    schema = f"k long, v double, ts timestamp, {OP_COL} string, {SEQ_COL} long"
    rows = [
        (1, 1.0, dt(2024, 1, 1, 0, 0), "+I", 1),
        (2, 2.0, dt(2024, 1, 1, 0, 30), "+I", 2),
        (3, 4.0, dt(2024, 1, 1, 6, 0), "+I", 3),
        (2, 2.0, dt(2024, 1, 1, 0, 30), "-D", 4),
    ]
    log = spark.createDataFrame(rows, schema)
    plan = maintain(
        aggs={"s": ("sum", F.col("v")), "n": ("count", F.lit(1))},
        keys=["k"], session={"ts": "ts", "gap": "1 hour"},
    )
    single = _net(_run_plan(plan, [log])[1])
    plan2 = maintain(
        aggs={"s": ("sum", F.col("v")), "n": ("count", F.lit(1))},
        keys=["k"], session={"ts": "ts", "gap": "1 hour"},
    )
    split = _net(_run_plan(plan2, _seq_batches(log, 3))[1])
    assert single == split
    assert single == {
        (dt(2024, 1, 1, 0, 0), dt(2024, 1, 1, 1, 0), 1.0, 1),
        (dt(2024, 1, 1, 6, 0), dt(2024, 1, 1, 7, 0), 4.0, 1),
    }


def test_maintain_chain_dispatch_and_guards(spark):
    plan = maintain(chain=[(["k"], "inner"), (["j"], "left")])
    assert plan.kind == "join_chain"
    with pytest.raises(ValueError, match="at least two stages"):
        maintain(chain=[(["k"], "inner")])
    with pytest.raises(ValueError, match="how must be"):
        maintain(chain=[(["k"], "inner"), (["j"], "cross")])
    with pytest.raises(ValueError, match="do not support ttl"):
        maintain(chain=[(["k"], "inner"), (["j"], "inner")], ttl="ts")
    with pytest.raises(ValueError, match="exactly one shape"):
        maintain(chain=[(["k"], "inner"), (["j"], "inner")], on=["k"])
    with pytest.raises(ValueError, match="steps 3 batches"):
        df = spark.createDataFrame(
            [(1, 1, "+I", 1)], f"k long, j long, {OP_COL} string, {SEQ_COL} long"
        )
        plan.step(None, df, df)


def test_maintain_distinct_dispatch_and_guards(spark):
    from flink_cdc_2_3_0_src_spark.operators.maintain import (
        _DistinctAggPlan,
    )

    plan = maintain(
        aggs={}, distinct={"nd": ("count", F.col("v"))}, group_cols=["g"]
    )
    assert isinstance(plan, _DistinctAggPlan)
    with pytest.raises(ValueError, match="sum/count/avg"):
        maintain(
            aggs={}, distinct={"m": ("max", F.col("v"))}, group_cols=["g"]
        )
    with pytest.raises(ValueError, match="duplicate output column"):
        maintain(
            aggs={"x": ("sum", F.col("v"))},
            distinct={"x": ("count", F.col("v"))},
            group_cols=["g"],
        )
    # r11: min/max COMBINE with distinct views (both ride the same
    # value-multiset state — no second plan needed)
    from flink_cdc_2_3_0_src_spark.operators.maintain import (
        _DistinctAggPlan,
    )

    combo = maintain(
        aggs={"m": ("max", F.col("v"))}, keys=["k"],
        distinct={"nd": ("count", F.col("v"))}, group_cols=["g"],
    )
    assert isinstance(combo, _DistinctAggPlan)
    assert {n for n, _ in combo.distinct} == {"m", "nd"}
    # r12: distinct under SESSION windows dispatches the session plan
    # (distinct recomputes from the materialized table — exact under
    # merges/splits, no view state)
    from flink_cdc_2_3_0_src_spark.operators.maintain import _SessionPlan

    sess = maintain(
        aggs={"s": ("sum", F.col("v"))}, keys=["k"],
        distinct={"nd": ("count", F.col("v"))}, group_cols=["g"],
        session=("ts", "1 hour"),
    )
    assert isinstance(sess, _SessionPlan)
    assert set(sess.distinct) == {"nd"}
    with pytest.raises(ValueError, match="duplicate output column"):
        maintain(
            aggs={"nd": ("sum", F.col("v"))}, keys=["k"],
            distinct={"nd": ("count", F.col("v"))}, group_cols=["g"],
            session=("ts", "1 hour"),
        )
    # r12: the GLOBAL aggregate (group_cols=[]) rides the constant-
    # group value-multiset plan for min/max and distinct
    glob = maintain(
        aggs={"m": ("max", F.col("v"))},
        distinct={"nd": ("count", F.col("v"))}, group_cols=[],
    )
    assert isinstance(glob, _DistinctAggPlan)
    assert glob.group_cols == []


@pytest.mark.slow
def test_maintain_session_fuzz_vs_python_reference(spark):
    """Randomized (seeded) upsert logs through batch splits: the
    session plan's accumulated deltas AND final result state equal a
    pure-Python gaps-and-islands replay.  Timestamp moves force session
    merges and splits mid-stream; NULL timestamps stay live but never
    session; integer sums keep comparisons exact."""
    import random
    from datetime import datetime, timedelta

    GAP_MIN = 10
    base = datetime(2024, 1, 1)
    rng = random.Random(0xC0FFEE)
    for trial in range(3):
        live = {}
        rows = []
        for seq in range(1, rng.randint(14, 30)):
            uid = rng.randrange(7)
            g = "ab"[uid % 2]
            if uid in live and rng.random() < 0.25:
                ov, om = live[uid]
                rows.append((uid, g, ov, om, "-D", seq))
                del live[uid]
            else:
                v = rng.randrange(50)
                m = (
                    None
                    if rng.random() < 0.15
                    else rng.randrange(0, 120)
                )
                if uid in live:
                    ov, om = live[uid]
                    rows.append((uid, g, ov, om, "-U", seq))
                    rows.append((uid, g, v, m, "+U", seq))
                else:
                    rows.append((uid, g, v, m, "+I", seq))
                live[uid] = (v, m)
        log = spark.createDataFrame(
            [
                (
                    k, g, v,
                    None if m is None else base + timedelta(minutes=m),
                    op, seq,
                )
                for k, g, v, m, op, seq in rows
            ],
            f"k long, g string, v long, ts timestamp, {OP_COL} string, "
            f"{SEQ_COL} long",
        )
        # python reference: per group, sort live non-null-ts rows and
        # break on gaps >= GAP_MIN
        by_g = {}
        for uid, (v, m) in live.items():
            if m is not None:
                by_g.setdefault("ab"[uid % 2], []).append((m, v))
        want = set()
        for g, pts in by_g.items():
            pts.sort()
            cur = [pts[0]]
            for p in pts[1:]:
                if p[0] - cur[-1][0] >= GAP_MIN:
                    ws, we = cur[0][0], cur[-1][0] + GAP_MIN
                    want.add((
                        g,
                        base + timedelta(minutes=ws),
                        base + timedelta(minutes=we),
                        sum(v for _, v in cur),
                        len(cur),
                    ))
                    cur = [p]
                else:
                    cur.append(p)
            ws, we = cur[0][0], cur[-1][0] + GAP_MIN
            want.add((
                g,
                base + timedelta(minutes=ws),
                base + timedelta(minutes=we),
                sum(v for _, v in cur),
                len(cur),
            ))
        for nb in (1, 4):
            plan = maintain(
                aggs={"s": ("sum", F.col("v")),
                      "n": ("count", F.lit(1))},
                group_cols=["g"], keys=["k"],
                session=("ts", f"{GAP_MIN} minutes"),
            )
            state, parts = _run_plan(plan, _seq_batches(log, nb))
            assert _net(parts) == want, f"session trial={trial} nb={nb}"
            final = {tuple(r) for r in state[1].collect()}
            assert final == want, f"session state trial={trial} nb={nb}"


@pytest.mark.slow
def test_maintain_distinct_fuzz_vs_python_reference(spark):
    """Randomized (seeded) upsert logs through batch splits: the
    distinct-agg plan's accumulated deltas equal a pure-Python distinct
    set replay — duplicate values, NULLs, re-inserts and group-moving
    updates included."""
    import random

    rng = random.Random(0xD15C)
    for trial in range(3):
        live = {}  # uid -> (g, v); g is mutable so updates MOVE groups
        rows = []
        for seq in range(1, rng.randint(14, 30)):
            uid = rng.randrange(8)
            if uid in live and rng.random() < 0.25:
                og, ov = live[uid]
                rows.append((og, uid, ov, "-D", seq))
                del live[uid]
            else:
                # small domains so duplicate values and group-moving
                # updates (-U in the OLD group, +U in the NEW) are
                # common — the dual-affected-group delta path
                g = rng.randrange(3)
                v = None if rng.random() < 0.2 else rng.randrange(5)
                if uid in live:
                    og, ov = live[uid]
                    rows.append((og, uid, ov, "-U", seq))
                    rows.append((g, uid, v, "+U", seq))
                else:
                    rows.append((g, uid, v, "+I", seq))
                live[uid] = (g, v)
        log = spark.createDataFrame(
            rows,
            f"g long, k long, v long, {OP_COL} string, {SEQ_COL} long",
        )
        by_g = {}
        for _uid, (g, v) in live.items():
            by_g.setdefault(g, []).append(v)
        want = set()
        for g, vs in by_g.items():
            dv = {v for v in vs if v is not None}
            want.add((
                g, len(vs), len(dv), sum(dv) if dv else None,
                max(dv) if dv else None, min(dv) if dv else None,
            ))
        for nb in (1, 4):
            # mx/mn ride the SAME value-multiset state (r11: Flink's
            # Min/MaxWithRetractAggFunction shape — min/max without
            # keys= routes here), so this fuzz also pins retractions
            # that remove the current extremum with/without a twin
            plan = maintain(
                aggs={"n": ("count", F.lit(1)),
                      "mx": ("max", F.col("v")),
                      "mn": ("min", F.col("v"))},
                distinct={"nd": ("count", F.col("v")),
                          "sd": ("sum", F.col("v"))},
                group_cols=["g"],
            )
            _, parts = _run_plan(plan, _seq_batches(log, nb))
            assert _net(parts) == want, f"distinct trial={trial} nb={nb}"
