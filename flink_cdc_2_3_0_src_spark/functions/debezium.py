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


def to_debezium_json(
    df: DataFrame,
    payload_cols: Sequence[str],
    db: str = "testdb",
    table: str = "t",
    op_col: str = OP_COL,
    seq_col: str = SEQ_COL,
) -> DataFrame:
    """Changelog rows → one JSON envelope string per *change* (A15).

    -U rows are folded into their +U partner's ``before`` field when both
    are present keyed by seq; for upsert-shape inputs (no -U) ``before``
    is null — matching what a Debezium consumer sees from an upsert
    source. Output: (value STRING, _seq LONG).
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
    return joined.select(F.to_json(env).alias("value"), F.col(seq_col))


def payload_cols_type(df: DataFrame, payload_cols: Sequence[str]) -> T.StructType:
    return T.StructType([df.schema[c] for c in payload_cols])


def _op_code(op_col_expr):
    return (
        F.when(op_col_expr == OP_INSERT, F.lit("c"))
        .when(op_col_expr == OP_UPDATE_AFTER, F.lit("u"))
        .when(op_col_expr == OP_DELETE, F.lit("d"))
        .otherwise(F.lit("u"))
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
        ]
    )


def from_debezium_json(
    df: DataFrame,
    payload_schema: T.StructType,
    value_col: str = "value",
) -> DataFrame:
    """JSON envelope strings → changelog rows with _op/_seq (A13).

    op codes: c|r → +I, d → -D (before image), u → (-U before, +U after)
    pair — reference RowDataDebeziumDeserializeSchema.java:123-145.
    """
    env = F.from_json(F.col(value_col), debezium_envelope_schema(payload_schema))
    flat = df.select(
        env["before"].alias("before"),
        env["after"].alias("after"),
        env["op"].alias("op"),
        env["ts_ms"].alias(SEQ_COL),
    )
    return expand_updates(flat, "before", "after", "op", SEQ_COL)
