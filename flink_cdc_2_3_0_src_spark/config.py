"""Source configuration + validation (A21, A33).

Option names mirror the reference's public option surface
(MySqlSourceOptions.java) so a user of the reference can port a DDL
``WITH (...)`` block 1:1. Validation reproduces
MySqlTableSourceFactory.java:113-123, 270-345 + MySqlValidator checks as
build-time ValueErrors.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

from flink_cdc_2_3_0_src_spark.model import StartupMode
from flink_cdc_2_3_0_src_spark.plans.chunking import (
    DEFAULT_CHUNK_SIZE,
    DEFAULT_DIST_FACTOR_LOWER,
    DEFAULT_DIST_FACTOR_UPPER,
)


@dataclass
class SourceConfig:
    hostname: str = "localhost"
    port: Optional[int] = None  # dialect default (3306 mysql / 5432 pg)
    username: str = ""
    password: str = ""
    database_list: list[str] = field(default_factory=list)   # regex include
    table_list: list[str] = field(default_factory=list)      # regex include
    server_id: Optional[str] = None                          # "5400" | "5400-5404"
    server_time_zone: str = "UTC"
    # snapshot chunking (defaults = reference MySqlSourceOptions.java)
    incremental_snapshot_enabled: bool = True
    chunk_size: int = DEFAULT_CHUNK_SIZE                     # :104-106
    fetch_size: int = 1024                                   # :111-113
    chunk_key_column: Optional[str] = None
    dist_factor_lower: float = DEFAULT_DIST_FACTOR_LOWER     # :207-213
    dist_factor_upper: float = DEFAULT_DIST_FACTOR_UPPER     # :215-222
    connection_pool_size: int = 20                           # :125-127
    connect_timeout_sec: int = 30                            # :118-120
    connect_max_retries: int = 3                             # :129-133
    # startup (A21, StartupOptions.java:29-95)
    startup_mode: StartupMode = StartupMode.INITIAL
    startup_specific_offset_file: Optional[str] = None
    startup_specific_offset_pos: Optional[int] = None
    startup_specific_gtid_set: Optional[str] = None
    startup_specific_skip_events: int = 0
    startup_specific_skip_rows: int = 0
    startup_timestamp_ms: Optional[int] = None
    # column projection (Debezium column.include.list): capture only
    # these columns; split-key/PK columns are always retained so the
    # chunk protocol and upsert merge stay keyed.  None = all columns.
    column_include_list: Optional[list[str]] = None
    # per-table snapshot statement override (Debezium
    # snapshot.select.statement.overrides): dotted table name -> SELECT
    # used as the snapshot source (wrapped as a derived table; chunk
    # predicates and projection apply on top)
    snapshot_select_overrides: Optional[dict] = None
    # misc
    heartbeat_interval_sec: int = 30                         # :188-190
    chunk_meta_group_size: int = 1000                        # :199-201 (driver-local
    #   manifest makes the split-meta RPC grouping a no-op in Spark; parsed
    #   for option-surface parity and surfaced on the manifest writer)
    scan_newly_added_table_enabled: bool = False             # :233-235
    include_schema_changes: bool = False
    # per-dialect identity parts: schema-name (Postgres/Oracle/SqlServer/
    # Db2 — JdbcSourceOptions.java SCHEMA_NAME) and tenant-name
    # (OceanBase only — OceanBaseTableSourceFactory.java:57); surfaced
    # as _schema/_tenant metadata columns via append_metadata
    schema_name: Optional[str] = None
    tenant_name: Optional[str] = None
    # Mongo legacy copy-existing surface (MongoDBSourceOptions.java:71-85,
    # MongoDBSource.java:181-226): copy.existing gates the initial
    # snapshot; copy.existing.pipeline is a JSON array of aggregation
    # stages (a $match pre-filter pushed into the snapshot scan);
    # queue.size / max.threads are the copy manager's buffering knobs
    # (Spark's scan parallelism supersedes them — parsed and validated
    # for option-surface parity, surfaced on the config).
    copy_existing: bool = True
    copy_existing_pipeline: Optional[str] = None
    copy_existing_queue_size: int = 10240
    copy_existing_max_threads: Optional[int] = None
    parallelism: int = 1
    # Debezium embedded-engine passthrough: every `debezium.*`-prefixed
    # option lands here with the prefix stripped (reference
    # DebeziumOptions.java getDebeziumProperties).  Recognized keys are
    # ALSO lifted onto first-class fields below.
    debezium_properties: dict = field(default_factory=dict)
    # debezium.decimal.handling.mode → converters.decimal_converter mode
    # (RowDataDebeziumDeserializeSchema.java:555-587)
    decimal_handling_mode: str = "precise"

    def validate(self) -> "SourceConfig":
        """A33 build-time checks; raises ValueError like the reference
        throws ValidationException."""
        if self.chunk_size < 1:
            raise ValueError("chunk.size must be >= 1")
        if self.fetch_size < 1:
            raise ValueError("fetch.size must be >= 1")
        if not (0 < self.dist_factor_lower <= 1.0):
            raise ValueError(
                "chunk-key.even-distribution.factor.lower-bound must be in (0, 1]"
            )
        if self.dist_factor_upper < 1.0:
            raise ValueError(
                "chunk-key.even-distribution.factor.upper-bound must be >= 1"
            )
        if self.dist_factor_lower > self.dist_factor_upper:
            raise ValueError("distribution factor lower bound > upper bound")
        for pattern in (*self.database_list, *self.table_list):
            try:
                re.compile(pattern)
            except re.error as e:
                raise ValueError(f"invalid include regex {pattern!r}: {e}") from e
        if self.server_id is not None:
            lo, _, hi = self.server_id.partition("-")
            if not lo.isdigit() or (hi and not hi.isdigit()):
                raise ValueError(f"invalid server-id {self.server_id!r}")
            # server-id range must cover parallelism
            # (MySqlTableSourceFactory.java:270-345)
            span = (int(hi) - int(lo) + 1) if hi else 1
            if span < self.parallelism:
                raise ValueError(
                    f"server-id range {self.server_id} smaller than "
                    f"parallelism {self.parallelism}"
                )
        if self.column_include_list is not None:
            if not self.column_include_list or any(
                not isinstance(c, str) or not c for c in self.column_include_list
            ):
                raise ValueError(
                    "column.include.list must be a non-empty list of column names"
                )
        if self.snapshot_select_overrides is not None:
            for t, sql in self.snapshot_select_overrides.items():
                if not isinstance(sql, str) or not sql.strip().lower().startswith(
                    "select"
                ):
                    raise ValueError(
                        "snapshot.select.statement.overrides entry for "
                        f"{t!r} must be a SELECT statement"
                    )
        if self.startup_mode == StartupMode.SPECIFIC_OFFSET:
            if self.startup_specific_gtid_set is None and (
                self.startup_specific_offset_file is None
                or self.startup_specific_offset_pos is None
            ):
                raise ValueError(
                    "specific-offset startup requires (file, pos) or gtid set"
                )
        if self.startup_mode == StartupMode.TIMESTAMP and self.startup_timestamp_ms is None:
            raise ValueError("timestamp startup requires startup_timestamp_ms")
        if self.startup_specific_skip_events < 0 or self.startup_specific_skip_rows < 0:
            raise ValueError("specific-offset skip-events/skip-rows must be >= 0")
        if self.chunk_meta_group_size < 1:
            raise ValueError("chunk-meta.group.size must be >= 1")
        if self.decimal_handling_mode not in ("precise", "string", "double"):
            raise ValueError(
                "decimal.handling.mode must be precise|string|double, got "
                f"{self.decimal_handling_mode!r}"
            )
        # checkArgument parity: MongoDBSource.Builder requires > 0 for
        # both knobs (MongoDBSource.java:198-211)
        if self.copy_existing_queue_size < 1:
            raise ValueError("copy.existing.queue.size must be > 0")
        if self.copy_existing_max_threads is not None and self.copy_existing_max_threads < 1:
            raise ValueError("copy.existing.max.threads must be > 0")
        if self.copy_existing_pipeline is not None:
            import json

            try:
                stages = json.loads(self.copy_existing_pipeline)
            except json.JSONDecodeError as e:
                raise ValueError(
                    f"copy.existing.pipeline is not valid JSON: {e}"
                ) from e
            if not isinstance(stages, list):
                raise ValueError(
                    "copy.existing.pipeline must be a JSON ARRAY of "
                    "aggregation stages, e.g. [{\"$match\": {...}}]"
                )
        return self

    def startup_offset(self):
        """Materialize the SPECIFIC_OFFSET startup position as a comparable
        BinlogOffset (file/pos + skip-events/skip-rows sub-position, or a
        GTID set — reference BinlogOffsetUtils.initializeEffectiveOffset +
        StartupOptions.specificOffset).  Returns None for other modes."""
        from flink_cdc_2_3_0_src_spark.model import BinlogOffset

        if self.startup_mode != StartupMode.SPECIFIC_OFFSET:
            return None
        return BinlogOffset(
            gtids=self.startup_specific_gtid_set,
            file=self.startup_specific_offset_file or "",
            pos=self.startup_specific_offset_pos or 0,
            skip_events=self.startup_specific_skip_events,
            skip_rows=self.startup_specific_skip_rows,
        )

    @staticmethod
    def from_options(opts: dict[str, str]) -> "SourceConfig":
        """Build from a reference-style option map ('hostname', 'port',
        'scan.incremental.snapshot.chunk.size', 'scan.startup.mode', ...)."""
        c = SourceConfig()
        simple = {
            "hostname": ("hostname", str),
            "port": ("port", int),
            "username": ("username", str),
            "password": ("password", str),
            "server-id": ("server_id", str),
            "server-time-zone": ("server_time_zone", str),
            "scan.incremental.snapshot.enabled": ("incremental_snapshot_enabled", lambda v: v == "true"),
            "scan.incremental.snapshot.chunk.size": ("chunk_size", int),
            "scan.snapshot.fetch.size": ("fetch_size", int),
            "scan.incremental.snapshot.chunk.key-column": ("chunk_key_column", str),
            "chunk-key.even-distribution.factor.lower-bound": ("dist_factor_lower", float),
            "chunk-key.even-distribution.factor.upper-bound": ("dist_factor_upper", float),
            "connection.pool.size": ("connection_pool_size", int),
            "connect.timeout": ("connect_timeout_sec", lambda v: int(v.rstrip("s"))),
            "connect.max-retries": ("connect_max_retries", int),
            "heartbeat.interval": ("heartbeat_interval_sec", lambda v: int(v.rstrip("s"))),
            "chunk-meta.group.size": ("chunk_meta_group_size", int),
            "scan.newly-added-table.enabled": ("scan_newly_added_table_enabled", lambda v: v == "true"),
            "include-schema-changes": ("include_schema_changes", lambda v: v == "true"),
            "schema-name": ("schema_name", str),
            "tenant-name": ("tenant_name", str),
            "copy.existing": ("copy_existing", lambda v: v == "true"),
            "copy.existing.pipeline": ("copy_existing_pipeline", str),
            "copy.existing.queue.size": ("copy_existing_queue_size", int),
            "copy.existing.max.threads": ("copy_existing_max_threads", int),
        }
        for k, v in opts.items():
            if k == "database-name":
                c.database_list = [v] if isinstance(v, str) else list(v)
            elif k == "table-name":
                c.table_list = [v] if isinstance(v, str) else list(v)
            elif k == "scan.startup.mode":
                c.startup_mode = StartupMode(v)
            elif k == "scan.startup.specific-offset.file":
                c.startup_specific_offset_file = v
            elif k == "scan.startup.specific-offset.pos":
                c.startup_specific_offset_pos = int(v)
            elif k == "scan.startup.specific-offset.gtid-set":
                c.startup_specific_gtid_set = v
            elif k == "scan.startup.specific-offset.skip-events":
                c.startup_specific_skip_events = int(v)
            elif k == "scan.startup.specific-offset.skip-rows":
                c.startup_specific_skip_rows = int(v)
            elif k == "scan.startup.timestamp-millis":
                c.startup_timestamp_ms = int(v)
            elif k.startswith("debezium."):
                # embedded-engine passthrough (reference DebeziumOptions
                # .getDebeziumProperties strips the prefix and forwards);
                # recognized engine keys are ALSO lifted to typed fields
                prop = k[len("debezium."):]
                c.debezium_properties[prop] = v
                if prop == "decimal.handling.mode":
                    c.decimal_handling_mode = v
                elif prop == "column.include.list":
                    c.column_include_list = [
                        s.strip() for s in v.split(",") if s.strip()
                    ]
                elif prop.startswith("snapshot.select.statement.overrides."):
                    table = prop[len("snapshot.select.statement.overrides."):]
                    if c.snapshot_select_overrides is None:
                        c.snapshot_select_overrides = {}
                    c.snapshot_select_overrides[table] = v
                # bare snapshot.select.statement.overrides (the table
                # LIST) needs no action: per-table keys carry the SQL
            elif k in simple:
                attr, conv = simple[k]
                setattr(c, attr, conv(v))
            # unknown keys are ignored (forward compatibility)
        return c
