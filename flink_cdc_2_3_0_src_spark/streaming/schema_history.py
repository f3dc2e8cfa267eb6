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
