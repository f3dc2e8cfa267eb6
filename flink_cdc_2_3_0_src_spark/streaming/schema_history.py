"""Schema-history persistence (A25).

The reference stores DDL-change records in Flink operator state so log
decoding can resolve the per-table schema at any offset
(EmbeddedFlinkDatabaseHistory.java, FlinkJsonTableChangeSerializer.java).
Spark mapping: a JSON registry in the checkpoint directory keyed by
(table, offset); the stream decoder asks ``schema_at(table, offset)``
when interpreting a log record, and DDL events append new versions.
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import types as T


class SchemaHistory:
    def __init__(self, path: str) -> None:
        self.path = path
        self._entries: list[dict] = []
        if os.path.exists(path):
            with open(path) as f:
                self._entries = json.load(f)

    def record(self, table: str, offset: int, schema: T.StructType, ddl: str = "") -> None:
        """Append a schema version effective from ``offset`` (inclusive)."""
        self._entries.append(
            {"table": table, "offset": offset, "schema": schema.json(), "ddl": ddl}
        )
        self._entries.sort(key=lambda e: (e["table"], e["offset"]))
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._entries, f)
        os.replace(tmp, self.path)

    def schema_at(self, table: str, offset: int) -> Optional[T.StructType]:
        """Latest schema whose effective offset is <= the given offset."""
        best = None
        for e in self._entries:
            if e["table"] == table and e["offset"] <= offset:
                best = e
        return T.StructType.fromJson(json.loads(best["schema"])) if best else None

    def versions(self, table: str) -> list[int]:
        return [e["offset"] for e in self._entries if e["table"] == table]

    def record_ddl(self, table: str, offset: int, ddl: str) -> T.StructType:
        """Record a RAW DDL statement: parse it into a structured
        TableChange (streaming/table_changes.py — the
        FlinkJsonTableChangeSerializer-style model), apply it to the
        table's latest schema, and persist the evolved schema with the
        structured change as the ddl payload.  This is the
        interpret-the-DDL path the reference's history uses
        (EmbeddedFlinkDatabaseHistory + MySqlAntlrDdlParser); ``record``
        remains the opaque-payload fallback for pre-parsed schemas."""
        from flink_cdc_2_3_0_src_spark.streaming.table_changes import (
            apply_change,
            parse_ddl,
        )

        change = parse_ddl(ddl)
        prior_offsets = self.versions(table)
        prior = self.schema_at(table, prior_offsets[-1]) if prior_offsets else None
        evolved = apply_change(prior, change)
        if change.type == "NOOP":
            # index/constraint/truncate statements change no column
            # layout — no version boundary recorded
            return prior
        if evolved is None:
            raise ValueError(f"DROP TABLE ends history for {table!r}")
        self.record(table, offset, evolved, ddl=change.to_json())
        return evolved

    def change_at(self, table: str, offset: int):
        """Structured TableChange recorded exactly at ``offset`` (None
        for opaque-payload entries)."""
        from flink_cdc_2_3_0_src_spark.streaming.table_changes import TableChange

        for e in self._entries:
            if e["table"] == table and e["offset"] == offset and e["ddl"]:
                try:
                    return TableChange.from_json(e["ddl"])
                except (ValueError, KeyError):
                    return None
        return None


def apply_schema_change_stream(
    log,
    history: SchemaHistory,
    table: str,
    include_schema_changes: bool = False,
    payload_col: str = "value",
    skip_unparseable_ddl: bool = False,
):
    """Schema-change records flowing THROUGH the stream (reference
    ``includeSchemaChanges``, MySqlRecordEmitter.java:109-121): every
    ``+S`` record's payload (a TableChange-style schema JSON, the shape
    FlinkJsonTableChangeSerializer persists) is recorded into the
    history keyed by its log offset; data events continue downstream;
    the ``+S`` rows are additionally kept in the returned stream when
    ``include_schema_changes`` is on, else dropped after recording.

    DDL events are rare, so driver-side recording (a collect of ONLY the
    +S rows) matches the reference, which records them in enumerator/
    operator state rather than the data path.
    """
    import json as _json

    from pyspark.sql import functions as F

    from flink_cdc_2_3_0_src_spark.model import OP_COL, OP_SCHEMA, SEQ_COL

    changes = log.filter(F.col(OP_COL) == OP_SCHEMA)
    # bounded collect: +S rows only — DDL events, a handful per table
    # lifetime, never data-sized (the reference holds the same records
    # whole in operator state)
    rows = changes.select(SEQ_COL, payload_col).collect()
    for r in sorted(rows, key=lambda x: x[SEQ_COL]):
        payload = r[payload_col]
        if payload.lstrip().startswith("{"):
            # schema-JSON payload form; a malformed one must fail AS a
            # JSON error, not get rerouted to the DDL parser
            schema = T.StructType.fromJson(_json.loads(payload))
            history.record(table, int(r[SEQ_COL]), schema, ddl=payload)
            continue
        # RAW DDL statement, the form a real binlog carries: parse into
        # a structured TableChange and evolve the table's schema (A25
        # payload fidelity; reference MySqlAntlrDdlParser by way of
        # EmbeddedFlinkDatabaseHistory).  Index/truncate-class
        # statements are schema no-ops; anything unparseable either
        # raises (default — silent schema drift is worse than a crash)
        # or is skipped under ``skip_unparseable_ddl`` (the reference's
        # database.history.skip.unparseable.ddl flag).
        try:
            history.record_ddl(table, int(r[SEQ_COL]), payload)
        except ValueError:
            if not skip_unparseable_ddl:
                raise
    data = log.filter(F.col(OP_COL) != OP_SCHEMA)
    return log if include_schema_changes else data


def decode_with_history(
    envelopes,
    history: SchemaHistory,
    table: str,
    seq_col: str = "_seq",
    value_col: str = "value",
):
    """Decode Debezium-JSON envelopes whose payload schema EVOLVES
    mid-log (A25 as a data path, not just a registry).

    Each schema version decodes the offset range it governs
    [version_offset, next_version_offset); the decoded slices are
    unioned with missing columns null-filled — the Spark shape of
    "replay DDL history so log decoding has the right per-offset
    schema" (reference EmbeddedFlinkDatabaseHistory).

    ``envelopes``: DataFrame with (value: JSON string, seq). Returns the
    changelog DataFrame under the LATEST schema.
    """
    from pyspark.sql import functions as F

    from flink_cdc_2_3_0_src_spark.functions.debezium import from_debezium_json

    offsets = history.versions(table)
    if not offsets:
        raise ValueError(f"no schema history for table {table!r}")
    schemas = [history.schema_at(table, off) for off in offsets]
    latest = schemas[-1]
    parts = []
    for i, off in enumerate(offsets):
        schema = schemas[i]
        upper = offsets[i + 1] if i + 1 < len(offsets) else None
        sl = envelopes.filter(F.col(seq_col) >= off)
        if upper is not None:
            sl = sl.filter(F.col(seq_col) < upper)
        decoded = from_debezium_json(sl, schema, value_col)
        # columns added by later schema versions: backfill with the
        # column's DDL DEFAULT when one was recorded (MySQL backfills
        # existing rows with the default at ALTER time, so pre-ALTER
        # slices must show it — Debezium default-value converters;
        # reference customer.sql default_value_test), else typed NULL.
        # The default in force is the one from the FIRST version where
        # the column appears after this slice (its ADD-time default) —
        # a later MODIFY ... DEFAULT changes defaults only for future
        # inserts, never rewriting the backfilled rows.
        from flink_cdc_2_3_0_src_spark.streaming.table_changes import (
            default_fill_expr,
        )

        for f in latest.fields:
            if f.name not in decoded.columns:
                add_time = next(
                    (
                        s[f.name]
                        for s in schemas[i + 1 :]
                        if f.name in s.fieldNames()
                    ),
                    f,
                )
                decoded = decoded.withColumn(
                    f.name,
                    default_fill_expr(add_time).cast(f.dataType),
                )
        parts.append(decoded.select(*[f.name for f in latest.fields], "_op", "_seq"))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
