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
