"""Debezium transaction-metadata handling: transaction-consistent
emission.

With ``provide.transaction.metadata=true`` Debezium attaches
``{"id", "total_order", "data_collection_order"}`` to every data event
and emits BEGIN/END boundary records (with per-collection
``event_count``) on the transaction topic.  A transaction-consistent
consumer must not release any event of a transaction until (a) the END
marker for that transaction id has arrived and (b) every event the
marker promises has been observed; committed transactions are then
released whole, ordered by commit position, events inside a transaction
by their ``total_order``.

This is the same buffered two-phase shape as the TiDB resolver
(streaming/tidb.py resolve_two_phase) restated for the Debezium
envelope: completeness is an equi-join between the END markers and the
observed per-transaction counts — no state machine, no driver-side
buffering.  At scale both sides shuffle on the transaction id (high
cardinality, naturally parallel); the join output carries only ids +
commit positions back into the event stream.

Reference contract: Debezium transaction boundary semantics as consumed
by flink-cdc's Debezium envelope path
(RowDataDebeziumDeserializeSchema.java's envelope decode; the
transaction block is sibling to ``before``/``after``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_cdc_2_3_0_src_spark.model import SEQ_COL

#: room for per-transaction event ordering inside the commit-ordered
#: sequence: commit_seq * _ORDER_SPAN + total_order stays collision-free
#: for transactions up to one million events
_ORDER_SPAN = 1_000_000


def committed_changelog(
    log: DataFrame,
    boundaries: DataFrame,
    txn_col: str = "txn_id",
    order_col: str = "txn_order",
) -> DataFrame:
    """Filter ``log`` down to COMPLETE, COMMITTED transactions and
    re-sequence it in commit order.

    ``log``: changelog rows + (txn_col, order_col) transaction metadata.
    ``boundaries``: transaction topic — (txn_col, status, event_count,
    commit_seq); only END markers commit.

    Returns the log rows of committed transactions with ``_seq``
    replaced by the commit-ordered sequence
    (commit_seq * 1e6 + total_order) and a ``_commit_seq`` column; rows
    of in-flight or incomplete transactions are withheld (exactly what
    a restarting consumer must do — a BEGIN without END replays later).
    Rows with a NULL transaction id (metadata disabled upstream) are
    withheld too: with provide.transaction.metadata on, every data
    event carries the block, so a NULL id means the event cannot be
    attributed to any commit.
    """
    # transaction topics are at-least-once: a replayed END marker must
    # not double-release its transaction (markers replay identically, so
    # any surviving duplicate row is byte-equal and the pick is stable)
    ends = (
        boundaries.filter(F.col("status") == "END")
        .select(txn_col, "event_count", "commit_seq")
        .dropDuplicates([txn_col])
    )
    observed = log.groupBy(txn_col).agg(F.count(F.lit(1)).alias("_n_obs"))
    committed = (
        ends.join(observed, txn_col)
        .where(F.col("event_count") == F.col("_n_obs"))
        .select(txn_col, "commit_seq")
    )
    out_cols = [c for c in log.columns if c != SEQ_COL]
    return (
        log.join(committed, txn_col)
        .select(
            *out_cols,
            F.col("commit_seq").alias("_commit_seq"),
            (
                F.col("commit_seq") * F.lit(_ORDER_SPAN)
                + F.col(order_col)
            ).alias(SEQ_COL),
        )
    )


# ---------------------------------------------------------------------------
# Streaming (stateful) variant: applyInPandasWithState keyed by txn id.

from pyspark.sql import types as T  # noqa: E402
from pyspark.sql.streaming.state import (  # noqa: E402
    GroupState,
    GroupStateTimeout,
)

TXN_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("_op", T.StringType()),
        T.StructField("_commit_seq", T.LongType()),
        T.StructField("_seq", T.LongType()),
    ]
)

_TXN_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_expected", T.LongType()),  # -1 until END seen
        T.StructField("commit_seq", T.LongType()),
        T.StructField("uids", T.ArrayType(T.LongType())),
        T.StructField("vals", T.ArrayType(T.DoubleType())),
        T.StructField("ops", T.ArrayType(T.StringType())),
        T.StructField("orders", T.ArrayType(T.LongType())),
    ]
)


def streaming_committed_changelog(stream) -> "DataFrame":
    """Unbounded transaction-consistent emission: the streaming twin of
    ``committed_changelog`` for a UNIFIED stream carrying both data
    events (kind='D') and transaction END markers (kind='E').

    Input columns: txn_id long, kind string ('D'|'E'), user_id long,
    value double, _op string, txn_order long, event_count long,
    commit_seq long (the marker fields are NULL on data rows and vice
    versa).

    Per-transaction state buffers events until the END marker has
    arrived AND the observed count equals the promised event_count,
    then releases the WHOLE transaction (commit-ordered _seq) exactly
    once and clears the state.  In-flight transactions survive
    checkpoint/restart inside the state store — the exactly-once story
    is Structured Streaming's, not reimplemented here.  State per open
    transaction is its buffered events; transactions are bounded by the
    source's open-transaction window (an abandoned transaction never
    commits upstream either — GC it with a processing-time timeout if
    the source can truly orphan transactions)."""
    import pandas as pd  # noqa: F811

    def _fn(key, pdfs, state: GroupState):
        n_expected, commit_seq = -1, -1
        uids, vals, ops, orders = [], [], [], []
        if state.exists:
            n_expected, commit_seq, uids, vals, ops, orders = state.get
            uids, vals, ops, orders = (
                list(uids),
                list(vals),
                list(ops),
                list(orders),
            )
        for pdf in pdfs:
            # explicit column zip: itertuples would RENAME _op (namedtuple
            # fields cannot start with an underscore)
            for kind, uid, val, op, order, ec, cs in zip(
                pdf["kind"],
                pdf["user_id"],
                pdf["value"],
                pdf["_op"],
                pdf["txn_order"],
                pdf["event_count"],
                pdf["commit_seq"],
            ):
                if kind == "E":
                    n_expected = int(ec)
                    commit_seq = int(cs)
                else:
                    uids.append(int(uid))
                    vals.append(float(val))
                    ops.append(str(op))
                    orders.append(int(order))
        if 0 <= n_expected == len(uids):
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": uids,
                    "value": vals,
                    "_op": ops,
                    "_commit_seq": [commit_seq] * len(uids),
                    "_seq": [
                        commit_seq * _ORDER_SPAN + o for o in orders
                    ],
                }
            )
        else:
            state.update((n_expected, commit_seq, uids, vals, ops, orders))

    return stream.groupBy("txn_id").applyInPandasWithState(
        _fn,
        TXN_OUT_SCHEMA,
        _TXN_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def streaming_committed_changelog_generic(stream, payload_schema: T.StructType):
    """``streaming_committed_changelog`` for ANY payload schema.

    The fixed-shape variant above hardcodes the scripted fixture's
    (user_id, value) columns because applyInPandasWithState needs a
    static state schema; this generic form keeps the state schema
    payload-independent by buffering each event's payload as ONE JSON
    string (encoded with ``to_json`` upstream, decoded with
    ``from_json`` on release) — a real table's arbitrary columns ride
    through unchanged.

    Input columns: ``txn_id long, kind string ('D'|'E'), payload_json
    string, txn_order long, event_count long, commit_seq long`` (marker
    fields NULL on data rows and vice versa).  Build ``payload_json``
    with ``F.to_json(F.struct(*payload_cols))``.

    Output: the payload columns restored (``from_json``) +
    ``_commit_seq`` + commit-ordered ``_seq`` — same release contract
    as the fixed-shape operator (END seen AND observed == promised →
    whole transaction exactly once)."""
    import pandas as pd
    from pyspark.sql import functions as F

    out_schema = T.StructType(
        [
            T.StructField("payload_json", T.StringType()),
            T.StructField("_commit_seq", T.LongType()),
            T.StructField("_seq", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n_expected", T.LongType()),
            T.StructField("commit_seq", T.LongType()),
            T.StructField("payloads", T.ArrayType(T.StringType())),
            T.StructField("orders", T.ArrayType(T.LongType())),
        ]
    )

    def _fn(key, pdfs, state: GroupState):
        n_expected, commit_seq = -1, -1
        payloads, orders = [], []
        if state.exists:
            n_expected, commit_seq, payloads, orders = state.get
            payloads, orders = list(payloads), list(orders)
        for pdf in pdfs:
            for kind, pj, order, ec, cs in zip(
                pdf["kind"],
                pdf["payload_json"],
                pdf["txn_order"],
                pdf["event_count"],
                pdf["commit_seq"],
            ):
                if kind == "E":
                    n_expected = int(ec)
                    commit_seq = int(cs)
                else:
                    payloads.append(str(pj))
                    orders.append(int(order))
        if 0 <= n_expected == len(payloads):
            state.remove()
            yield pd.DataFrame(
                {
                    "payload_json": payloads,
                    "_commit_seq": [commit_seq] * len(payloads),
                    "_seq": [commit_seq * _ORDER_SPAN + o for o in orders],
                }
            )
        else:
            state.update((n_expected, commit_seq, payloads, orders))

    released = stream.groupBy("txn_id").applyInPandasWithState(
        _fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
    parsed = released.select(
        F.from_json(F.col("payload_json"), payload_schema).alias("p"),
        "_commit_seq",
        "_seq",
    )
    return parsed.select(
        *[F.col("p")[f.name].alias(f.name) for f in payload_schema.fields],
        "_commit_seq",
        "_seq",
    )
