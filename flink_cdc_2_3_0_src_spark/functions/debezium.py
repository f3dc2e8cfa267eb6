"""Debezium-JSON envelope codec (A13 decode / A15 encode).

Reference parity: JsonDebeziumDeserializationSchema.java:36-91 serializes
a SourceRecord to the Debezium JSON envelope {before, after, source, op,
ts_ms}; RowDataDebeziumDeserializeSchema.java:118-146 decodes it to typed
rows with RowKind. Here both directions are pure Spark expressions
(to_json / from_json) — JVM-side, codegen'd, no Python in the data path.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_cdc_2_3_0_src_spark.model import (
    OP_COL,
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE_AFTER,
    OP_UPDATE_BEFORE,
    SEQ_COL,
)
from flink_cdc_2_3_0_src_spark.operators.changelog import expand_updates

# changelog op ↔ debezium op code (READ and CREATE both map from +I; we
# emit 'c' — the reference maps c|r → INSERT on decode, so the round trip
# is stable).
_OP_TO_DBZ = {OP_INSERT: "c", OP_UPDATE_AFTER: "u", OP_DELETE: "d"}


_CONNECT_TYPES = {
    "long": "int64",
    "integer": "int32",
    "short": "int16",
    "byte": "int8",
    "double": "float64",
    "float": "float32",
    "string": "string",
    "boolean": "boolean",
    "binary": "bytes",
    "date": "int32",
    "timestamp": "int64",
    "timestamp_ntz": "int64",
}


def connect_schema_json(payload_schema: T.StructType, name: str = "envelope") -> str:
    """Kafka-Connect-style schema descriptor for the envelope — what the
    reference's ``includeSchema=true`` mode wraps around every record
    (JsonDebeziumDeserializationSchema.java:47-56 delegates to the
    Connect JsonConverter; this emits the same shape)."""
    import json

    def field_desc(f: T.StructField) -> dict:
        t = _CONNECT_TYPES.get(f.dataType.typeName(), "string")
        return {"type": t, "optional": True, "field": f.name}

    row = {
        "type": "struct",
        "fields": [field_desc(f) for f in payload_schema.fields],
        "optional": True,
    }
    return json.dumps(
        {
            "type": "struct",
            "fields": [
                {**row, "field": "before"},
                {**row, "field": "after"},
                {
                    "type": "struct",
                    "fields": [
                        {"type": "string", "optional": False, "field": "db"},
                        {"type": "string", "optional": False, "field": "table"},
                    ],
                    "optional": False,
                    "field": "source",
                },
                {"type": "string", "optional": False, "field": "op"},
                {"type": "int64", "optional": True, "field": "ts_ms"},
            ],
            "optional": False,
            "name": name,
        },
        separators=(",", ":"),
    )


def to_debezium_json(
    df: DataFrame,
    payload_cols: Sequence[str],
    db: str = "testdb",
    table: str = "t",
    op_col: str = OP_COL,
    seq_col: str = SEQ_COL,
    include_schema: bool = False,
) -> DataFrame:
    """Changelog rows → one JSON envelope string per *change* (A15).

    -U rows are folded into their +U partner's ``before`` field when both
    are present keyed by seq; for upsert-shape inputs (no -U) ``before``
    is null — matching what a Debezium consumer sees from an upsert
    source. Output: (value STRING, _seq LONG).

    ``include_schema=True`` wraps each record in the Connect
    ``{"schema": ..., "payload": ...}`` envelope (the reference's
    ``includeSchema`` flag); the descriptor is a static per-table JSON
    literal, so the wrap is one codegen'd concat.
    """
    payload = F.struct(*[F.col(c) for c in payload_cols])
    before_rows = df.filter(F.col(op_col) == OP_UPDATE_BEFORE).select(
        F.col(seq_col).alias("__bseq"), payload.alias("__before")
    )
    after_rows = df.filter(F.col(op_col) != OP_UPDATE_BEFORE)
    joined = after_rows.join(
        before_rows, after_rows[seq_col] == before_rows["__bseq"], "left"
    )
    # Debezium deletes carry the last image in `before` with after=null;
    # updates carry the retracted image in `before` (folded from the -U
    # partner sharing the same seq).
    env = F.struct(
        F.when(F.col(op_col) == OP_DELETE, payload)
        .otherwise(F.col("__before"))
        .alias("before"),
        F.when(
            F.col(op_col) == OP_DELETE,
            F.lit(None).cast(payload_cols_type(df, payload_cols)),
        )
        .otherwise(payload)
        .alias("after"),
        F.struct(F.lit(db).alias("db"), F.lit(table).alias("table")).alias("source"),
        _op_code(F.col(op_col)).alias("op"),
        F.col(seq_col).alias("ts_ms"),
    )
    value = F.to_json(env)
    if include_schema:
        desc = connect_schema_json(payload_cols_type(df, payload_cols))
        value = F.concat(
            F.lit('{"schema":' + desc + ',"payload":'), value, F.lit("}")
        )
    return joined.select(value.alias("value"), F.col(seq_col))


def payload_cols_type(df: DataFrame, payload_cols: Sequence[str]) -> T.StructType:
    return T.StructType([df.schema[c] for c in payload_cols])


def _op_code(op_col_expr):
    return (
        F.when(op_col_expr == OP_INSERT, F.lit("c"))
        .when(op_col_expr == OP_UPDATE_AFTER, F.lit("u"))
        .when(op_col_expr == OP_DELETE, F.lit("d"))
        .otherwise(F.lit("u"))
    )


#: Debezium transaction block (provide.transaction.metadata=true):
#: sibling of before/after in every data event
TRANSACTION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("total_order", T.LongType()),
        T.StructField("data_collection_order", T.LongType()),
    ]
)


def debezium_envelope_schema(payload_schema: T.StructType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("before", payload_schema),
            T.StructField("after", payload_schema),
            T.StructField(
                "source",
                T.StructType(
                    [T.StructField("db", T.StringType()), T.StructField("table", T.StringType())]
                ),
            ),
            T.StructField("op", T.StringType()),
            T.StructField("ts_ms", T.LongType()),
            # absent from the JSON unless transaction metadata is on;
            # from_json yields NULL then, so the field is always safe
            T.StructField("transaction", TRANSACTION_SCHEMA),
        ]
    )


def from_debezium_json(
    df: DataFrame,
    payload_schema: T.StructType,
    value_col: str = "value",
    include_schema: bool = False,
    converters: Optional[dict] = None,
    include_transaction: bool = False,
) -> DataFrame:
    """JSON envelope strings → changelog rows with _op/_seq (A13).

    op codes: c|r → +I, d → -D (before image), u → (-U before, +U after)
    pair — reference RowDataDebeziumDeserializeSchema.java:123-145.
    ``include_schema=True`` unwraps the Connect ``{"schema", "payload"}``
    envelope first (the schema part is carried, not interpreted — the
    declared ``payload_schema`` drives decoding, §1.3).

    ``converters`` maps payload column name → (Column -> Column)
    runtime converter, applied AFTER the update expansion — the Spark
    analogue of the reference's per-column DeserializationRuntimeConverter
    matrix (RowDataDebeziumDeserializeSchema.java:362-587): declare the
    PHYSICAL encoding in ``payload_schema`` (string for Connect-Decimal
    base64, struct for VariableScaleDecimal / geometry) and the
    converter lifts it to the logical type — see
    ``functions.converters`` for the stock decimal / SET / geometry
    converters.

    ``include_transaction=True`` surfaces the Debezium transaction
    block (provide.transaction.metadata) as ``txn_id`` / ``txn_order``
    columns — feed the result to
    ``streaming.transactions.committed_changelog`` for
    transaction-consistent emission; envelopes without the block yield
    NULLs.
    """
    raw = F.col(value_col)
    if include_schema:
        wrapper = T.StructType(
            [T.StructField("payload", debezium_envelope_schema(payload_schema))]
        )
        env = F.from_json(raw, wrapper)["payload"]
    else:
        env = F.from_json(raw, debezium_envelope_schema(payload_schema))
    txn_cols = (
        [
            env["transaction"]["id"].alias("txn_id"),
            env["transaction"]["total_order"].alias("txn_order"),
        ]
        if include_transaction
        else []
    )
    flat = df.select(
        env["before"].alias("before"),
        env["after"].alias("after"),
        env["op"].alias("op"),
        env["ts_ms"].alias(SEQ_COL),
        *txn_cols,
    )
    # Kafka TOMBSTONES (value IS NULL — Debezium emits one after every
    # delete for log compaction), unparseable payloads, and non-data
    # ops must be dropped, not expanded.  The op filter is a CLOSED set
    # (c/r/u/d): Debezium 't' (truncate) and 'm' (message) events carry
    # null before AND after, so letting them reach expand_updates'
    # update branch would explode each into a -U/+U pair of all-NULL
    # rows (Debezium itself defaults to skipping truncate events —
    # skipped.operations=t).  An envelope with a missing op but a
    # non-null image is a producer bug, not data — also dropped.
    flat = flat.filter(F.col("op").isin("c", "r", "u", "d"))
    out = expand_updates(flat, "before", "after", "op", SEQ_COL)
    if converters:
        out = out.select(
            *[
                converters[c](F.col(c)).alias(c) if c in converters else F.col(c)
                for c in out.columns
            ]
        )
    return out
