"""DataStream-style builder API (SURVEY §3.2).

The reference's second public surface is the fluent builder

    MySqlSource.<String>builder().hostname(..).databaseList("db")
        .tableList("db.t").username(..).password(..)
        .startupOptions(StartupOptions.initial())
        .deserializer(new JsonDebeziumDeserializationSchema()).build()

(MySqlSource.java:75-117, MySqlSourceBuilder.java:56-244,
StartupOptions.java:29-95).  This module is the Spark-side equivalent:
the same fluent option names (snake_case), producing a validated
``SourceConfig`` plus a pluggable *deserializer* that projects the raw
changelog the way ``DebeziumDeserializationSchema<T>`` does
(JsonDebeziumDeserializationSchema.java:36-91 → JSON strings;
RowDataDebeziumDeserializeSchema → typed rows).

Builders exist for every connector family the engine models:

    MySqlSource.builder()      — incremental chunked snapshot + binlog
    PostgresSource.builder()   — + slot/plugin options, changelog-mode
    MongoDBSource.builder()    — upsert stream, sample/splitVector hints
    OracleSource.builder()     — schema list, LogMiner knobs
    SqlServerSource.builder()  — legacy Debezium wrapper options
    Db2Source.builder()        — legacy Debezium wrapper options
    TiDBSource.builder()       — PD endpoints, initial|latest only
    OceanBaseSource.builder()  — log-proxy endpoint, tenant

``build()`` returns a :class:`CdcSource` — a thin, inert value object:
``.config`` feeds the planner/pipeline layer (``plans.chunking``,
``streaming.hybrid``), ``.deserialize(df)`` applies the chosen
deserializer to a raw envelope DataFrame, ``.apply_startup(log)``
resolves the A21 startup mode.  No I/O happens at build time, matching
the reference where ``build()`` only captures configuration.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from flink_cdc_2_3_0_src_spark.config import SourceConfig
from flink_cdc_2_3_0_src_spark.model import StartupMode


# ---------------------------------------------------------------------------
# StartupOptions factories (reference StartupOptions.java:29-95)
# ---------------------------------------------------------------------------
@dataclass(frozen=True)
class StartupOptions:
    mode: StartupMode
    file: Optional[str] = None
    pos: Optional[int] = None
    gtid_set: Optional[str] = None
    skip_events: int = 0
    skip_rows: int = 0
    timestamp_ms: Optional[int] = None

    @staticmethod
    def initial() -> "StartupOptions":
        return StartupOptions(StartupMode.INITIAL)

    @staticmethod
    def earliest() -> "StartupOptions":
        return StartupOptions(StartupMode.EARLIEST)

    @staticmethod
    def latest() -> "StartupOptions":
        return StartupOptions(StartupMode.LATEST)

    @staticmethod
    def specific_offset(
        file: Optional[str] = None,
        pos: Optional[int] = None,
        gtid_set: Optional[str] = None,
        skip_events: int = 0,
        skip_rows: int = 0,
    ) -> "StartupOptions":
        return StartupOptions(
            StartupMode.SPECIFIC_OFFSET,
            file=file,
            pos=pos,
            gtid_set=gtid_set,
            skip_events=skip_events,
            skip_rows=skip_rows,
        )

    @staticmethod
    def timestamp(timestamp_ms: int) -> "StartupOptions":
        return StartupOptions(StartupMode.TIMESTAMP, timestamp_ms=timestamp_ms)


# ---------------------------------------------------------------------------
# Deserializers (reference DebeziumDeserializationSchema<T> plug point)
# ---------------------------------------------------------------------------
class JsonDebeziumDeserializationSchema:
    """Identity on the wire form: each record stays one Debezium-JSON
    envelope string (JsonDebeziumDeserializationSchema.java:36-91).
    ``include_schema`` mirrors the reference's includeSchema ctor flag."""

    def __init__(self, include_schema: bool = False):
        self.include_schema = include_schema

    def apply(self, raw: DataFrame, config: SourceConfig) -> DataFrame:
        return raw


class RowDataDeserializationSchema:
    """Typed decode: envelope JSON → changelog rows (+I/-U/+U/-D, _seq)
    with the runtime converter matrix — the Spark analogue of
    RowDataDebeziumDeserializeSchema.  ``converters`` maps column name →
    Column transform (see ``functions.converters``); the builder's
    ``debezium.decimal.handling.mode`` is honored by the caller choosing
    the matching physical ``payload_schema``."""

    def __init__(
        self,
        payload_schema: T.StructType,
        converters: Optional[dict] = None,
        include_schema: bool = False,
        include_transaction: bool = False,
    ):
        self.payload_schema = payload_schema
        self.converters = converters
        self.include_schema = include_schema
        self.include_transaction = include_transaction

    def apply(self, raw: DataFrame, config: SourceConfig) -> DataFrame:
        from flink_cdc_2_3_0_src_spark.functions.debezium import from_debezium_json

        return from_debezium_json(
            raw,
            self.payload_schema,
            include_schema=self.include_schema,
            converters=self.converters,
            include_transaction=self.include_transaction,
        )


class CanalJsonDeserializationSchema:
    """Canal-JSON topics → changelog rows: the format the reference's
    own docs point canal consumers at (functions/cdc_formats.py)."""

    def __init__(self, payload_schema: T.StructType):
        self.payload_schema = payload_schema

    def apply(self, raw: DataFrame, config: SourceConfig) -> DataFrame:
        from flink_cdc_2_3_0_src_spark.functions.cdc_formats import from_canal_json

        return from_canal_json(raw, self.payload_schema)


class MaxwellJsonDeserializationSchema:
    """Maxwell-JSON topics → changelog rows (functions/cdc_formats.py)."""

    def __init__(self, payload_schema: T.StructType):
        self.payload_schema = payload_schema

    def apply(self, raw: DataFrame, config: SourceConfig) -> DataFrame:
        from flink_cdc_2_3_0_src_spark.functions.cdc_formats import from_maxwell_json

        return from_maxwell_json(raw, self.payload_schema)


# ---------------------------------------------------------------------------
# The built source
# ---------------------------------------------------------------------------
@dataclass
class CdcSource:
    """Inert configured source (what the reference's ``build()`` returns).

    ``config`` plugs into the existing engine layers: chunk planning
    (``plans.chunking.ChunkPlanner``), hybrid snapshot+stream
    (``streaming.hybrid.HybridPipeline``), startup resolution
    (``streaming.startup.apply_startup_mode``)."""

    config: SourceConfig
    deserializer: object
    connector: str = "mysql-cdc"

    def deserialize(self, raw: DataFrame) -> DataFrame:
        """Apply the configured DebeziumDeserializationSchema analogue."""
        return self.deserializer.apply(raw, self.config)

    def apply_startup(self, log: DataFrame, current_tip: Optional[int] = None,
                      ts_col: str = "ts") -> DataFrame:
        """Resolve the A21 startup mode against a changelog DataFrame."""
        from flink_cdc_2_3_0_src_spark.streaming.startup import apply_startup_mode

        return apply_startup_mode(log, self.config, current_tip=current_tip,
                                  ts_col=ts_col)


# ---------------------------------------------------------------------------
# Builders
# ---------------------------------------------------------------------------
class MySqlSourceBuilder:
    """Fluent builder mirroring MySqlSourceBuilder.java:56-244 method for
    method (snake_case).  Unset options keep the reference defaults via
    ``SourceConfig``."""

    connector = "mysql-cdc"

    def __init__(self):
        self._c = SourceConfig()
        self._deserializer = JsonDebeziumDeserializationSchema()

    # -- connection --
    def hostname(self, hostname: str):
        self._c.hostname = hostname
        return self

    def port(self, port: int):
        self._c.port = port
        return self

    def username(self, username: str):
        self._c.username = username
        return self

    def password(self, password: str):
        self._c.password = password
        return self

    def database_list(self, *databases: str):
        self._c.database_list = list(databases)
        return self

    def table_list(self, *tables: str):
        self._c.table_list = list(tables)
        return self

    def server_id(self, server_id: str):
        self._c.server_id = server_id
        return self

    def server_time_zone(self, tz: str):
        self._c.server_time_zone = tz
        return self

    # -- chunking --
    def chunk_key_column(self, column: str):
        self._c.chunk_key_column = column
        return self

    def split_size(self, n: int):
        self._c.chunk_size = n
        return self

    def split_meta_group_size(self, n: int):
        self._c.chunk_meta_group_size = n
        return self

    def distribution_factor_upper(self, f: float):
        self._c.dist_factor_upper = f
        return self

    def distribution_factor_lower(self, f: float):
        self._c.dist_factor_lower = f
        return self

    def fetch_size(self, n: int):
        self._c.fetch_size = n
        return self

    # -- connectivity --
    def connect_timeout(self, seconds: int):
        self._c.connect_timeout_sec = seconds
        return self

    def connect_max_retries(self, n: int):
        self._c.connect_max_retries = n
        return self

    def connection_pool_size(self, n: int):
        self._c.connection_pool_size = n
        return self

    # -- behavior --
    def include_schema_changes(self, flag: bool):
        self._c.include_schema_changes = flag
        return self

    def scan_newly_added_table_enabled(self, flag: bool):
        self._c.scan_newly_added_table_enabled = flag
        return self

    def startup_options(self, opts: StartupOptions):
        c = self._c
        c.startup_mode = opts.mode
        c.startup_specific_offset_file = opts.file
        c.startup_specific_offset_pos = opts.pos
        c.startup_specific_gtid_set = opts.gtid_set
        c.startup_specific_skip_events = opts.skip_events
        c.startup_specific_skip_rows = opts.skip_rows
        c.startup_timestamp_ms = opts.timestamp_ms
        return self

    def heartbeat_interval(self, seconds: int):
        self._c.heartbeat_interval_sec = seconds
        return self

    def jdbc_properties(self, props: dict):
        # executor-side JDBC options (Spark passes them on the reader);
        # stored in the passthrough map under the reference's jdbc prefix
        for k, v in props.items():
            self._c.debezium_properties[f"jdbc.properties.{k}"] = str(v)
        return self

    def debezium_properties(self, props: dict):
        for k, v in props.items():
            self._c.debezium_properties[k] = str(v)
            if k == "decimal.handling.mode":
                self._c.decimal_handling_mode = v
        return self

    def deserializer(self, deserializer):
        self._deserializer = deserializer
        return self

    def build(self) -> CdcSource:
        if self._deserializer is None:
            raise ValueError("deserializer required (MySqlSourceBuilder.build checkNotNull)")
        return CdcSource(
            config=self._c.validate(),
            deserializer=self._deserializer,
            connector=self.connector,
        )


class PostgresSourceBuilder(MySqlSourceBuilder):
    """PostgreSQLSource.builder() parity: adds slot/plugin options and the
    configurable changelog mode (PostgreSQLTableFactory.java:106)."""

    connector = "postgres-cdc"

    def __init__(self):
        super().__init__()
        self.changelog_mode = "all"

    def decoding_plugin_name(self, name: str):
        self._c.debezium_properties["plugin.name"] = name
        return self

    def slot_name(self, name: str):
        self._c.debezium_properties["slot.name"] = name
        return self

    def changelog_mode_option(self, mode: str):
        if mode not in ("all", "upsert"):
            raise ValueError("changelog-mode must be all|upsert")
        self.changelog_mode = mode
        return self

    def build(self) -> CdcSource:
        src = super().build()  # connector resolves via the class attribute
        # carried for the consumer: upsert mode emits no -U images
        src.config.debezium_properties.setdefault("changelog.mode", self.changelog_mode)
        return src


class MongoDBSourceBuilder(MySqlSourceBuilder):
    """MongoDBSource.builder() parity: upsert-only stream, sample-based
    chunking hints (MongoDBTableSource.java:132-138)."""

    connector = "mongodb-cdc"

    def connection_options(self, opts: str):
        self._c.debezium_properties["connection.options"] = opts
        return self

    def copy_existing(self, flag: bool):
        self._c.debezium_properties["copy.existing"] = str(flag).lower()
        self._c.copy_existing = flag
        return self

    def copy_existing_pipeline(self, pipeline_json: str):
        """copy.existing.pipeline — JSON array of aggregation stages run
        over the snapshot copy, e.g. ``[{"$match": {"closed": false}}]``
        (MongoDBSource.java:215-226).  The $match stages become a scan
        predicate on the snapshot (see ``sources.mongo.match_pipeline_
        filter``), so the filter pushes into the parquet/collection
        scan."""
        self._c.copy_existing_pipeline = pipeline_json
        return self

    def copy_existing_queue_size(self, size: int):
        """copy.existing.queue.size (MongoDBSource.java:204-213); the
        copy manager's buffer bound — validated > 0 for parity, with
        Spark's scan batching superseding the actual queueing."""
        self._c.copy_existing_queue_size = size
        return self

    def copy_existing_max_threads(self, n: int):
        """copy.existing.max.threads (MongoDBSource.java:193-202);
        Spark's scan parallelism supersedes it — parsed and validated."""
        self._c.copy_existing_max_threads = n
        return self


class _SourceEntry:
    """`MySqlSource.builder()` style entry point."""

    def __init__(self, builder_cls):
        self._builder_cls = builder_cls

    def builder(self):
        return self._builder_cls()


MySqlSource = _SourceEntry(MySqlSourceBuilder)
PostgresSource = _SourceEntry(PostgresSourceBuilder)
MongoDBSource = _SourceEntry(MongoDBSourceBuilder)


class OracleSourceBuilder(MySqlSourceBuilder):
    """OracleSource.builder() parity (OracleSource.java:38-180): schema
    include list + LogMiner/XStream knobs through the passthrough map."""

    connector = "oracle-cdc"

    def schema_list(self, *schemas: str):
        self._c.debezium_properties["schema.whitelist"] = ",".join(schemas)
        return self

    def database(self, name: str):
        self._c.debezium_properties["database.dbname"] = name
        return self


class SqlServerSourceBuilder(MySqlSourceBuilder):
    """SqlServerSource.builder() parity (legacy Debezium wrapper)."""

    connector = "sqlserver-cdc"

    def database(self, name: str):
        self._c.debezium_properties["database.dbname"] = name
        return self


class Db2SourceBuilder(MySqlSourceBuilder):
    """Db2Source.builder() parity (legacy Debezium wrapper)."""

    connector = "db2-cdc"

    def database(self, name: str):
        self._c.debezium_properties["database.dbname"] = name
        return self


class TiDBSourceBuilder(MySqlSourceBuilder):
    """TiDBSource.builder() parity (TiDBSource.java:27-90): PD endpoints
    and TiKV client options; startup is initial|latest-offset only, as in
    the reference's switch."""

    connector = "tidb-cdc"

    def pd_addresses(self, addrs: str):
        self._c.debezium_properties["pd.addresses"] = addrs
        return self

    def tikv_grpc_timeout_ms(self, ms: int):
        self._c.debezium_properties["tikv.grpc.timeout_in_ms"] = str(ms)
        return self

    def build(self) -> CdcSource:
        from flink_cdc_2_3_0_src_spark.model import StartupMode as _SM

        if self._c.startup_mode not in (_SM.INITIAL, _SM.LATEST):
            raise ValueError(
                "tidb-cdc supports initial | latest-offset startup only "
                "(TiDBSource.java startup switch)"
            )
        return super().build()  # connector resolves via the class attribute


class OceanBaseSourceBuilder(MySqlSourceBuilder):
    """OceanBaseSource.builder() parity: log-proxy endpoint + tenant."""

    connector = "oceanbase-cdc"

    def log_proxy_host(self, host: str):
        self._c.debezium_properties["logproxy.host"] = host
        return self

    def log_proxy_port(self, port: int):
        self._c.debezium_properties["logproxy.port"] = str(port)
        return self

    def tenant_name(self, tenant: str):
        self._c.debezium_properties["tenant-name"] = tenant
        return self


OracleSource = _SourceEntry(OracleSourceBuilder)
SqlServerSource = _SourceEntry(SqlServerSourceBuilder)
Db2Source = _SourceEntry(Db2SourceBuilder)
TiDBSource = _SourceEntry(TiDBSourceBuilder)
OceanBaseSource = _SourceEntry(OceanBaseSourceBuilder)
