"""SURVEY §3.2 DataStream-builder facade (MySqlSourceBuilder.java:56-244,
StartupOptions.java:29-95, JsonDebeziumDeserializationSchema.java:36-91)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_cdc_2_3_0_src_spark.model import StartupMode
from flink_cdc_2_3_0_src_spark.operators.changelog import materialize, normalize_upsert
from flink_cdc_2_3_0_src_spark.functions.debezium import to_debezium_json
from flink_cdc_2_3_0_src_spark.sources.api import (
    JsonDebeziumDeserializationSchema,
    MongoDBSource,
    MySqlSource,
    PostgresSource,
    RowDataDeserializationSchema,
    StartupOptions,
)
from flink_cdc_2_3_0_src_spark.sources.scripted_log import scripted_changelog
from tests.conftest import SF_SMOKE
from tests.test_changelog import upsert_log


def test_builder_fluent_options_land_in_config():
    src = (
        MySqlSource.builder()
        .hostname("db.example")
        .port(3307)
        .database_list("app_db")
        .table_list("app_db.orders_.*", "app_db.users")
        .username("u")
        .password("p")
        .server_id("5400-5404")
        .server_time_zone("America/New_York")
        .chunk_key_column("order_id")
        .split_size(4096)
        .split_meta_group_size(500)
        .distribution_factor_upper(10.0)
        .distribution_factor_lower(0.01)
        .fetch_size(2048)
        .connect_timeout(45)
        .connect_max_retries(5)
        .connection_pool_size(8)
        .include_schema_changes(True)
        .scan_newly_added_table_enabled(True)
        .heartbeat_interval(15)
        .startup_options(StartupOptions.timestamp(1_700_000_000_000))
        .debezium_properties({"decimal.handling.mode": "double", "max.batch.size": "2048"})
        .jdbc_properties({"useSSL": "false"})
        .build()
    )
    c = src.config
    assert src.connector == "mysql-cdc"
    assert (c.hostname, c.port) == ("db.example", 3307)
    assert c.table_list == ["app_db.orders_.*", "app_db.users"]
    assert c.server_id == "5400-5404"
    assert c.server_time_zone == "America/New_York"
    assert (c.chunk_key_column, c.chunk_size, c.chunk_meta_group_size) == (
        "order_id", 4096, 500,
    )
    assert (c.dist_factor_upper, c.dist_factor_lower) == (10.0, 0.01)
    assert (c.fetch_size, c.connect_timeout_sec, c.connect_max_retries) == (
        2048, 45, 5,
    )
    assert c.connection_pool_size == 8
    assert c.include_schema_changes and c.scan_newly_added_table_enabled
    assert c.heartbeat_interval_sec == 15
    assert c.startup_mode == StartupMode.TIMESTAMP
    assert c.startup_timestamp_ms == 1_700_000_000_000
    assert c.decimal_handling_mode == "double"
    assert c.debezium_properties["max.batch.size"] == "2048"
    assert c.debezium_properties["jdbc.properties.useSSL"] == "false"


def test_builder_validates_at_build():
    # server-id span smaller than nothing is fine, but a bad chunk size
    # must fail at build() exactly like the reference's checkState
    b = MySqlSource.builder().split_size(0)
    with pytest.raises(ValueError, match="chunk.size"):
        b.build()
    b2 = MySqlSource.builder().deserializer(None)
    with pytest.raises(ValueError, match="deserializer"):
        b2.build()


def test_startup_options_factories():
    so = StartupOptions.specific_offset(
        file="mysql-bin.000003", pos=4567, skip_events=1, skip_rows=2
    )
    src = MySqlSource.builder().startup_options(so).build()
    off = src.config.startup_offset()
    assert (off.file, off.pos, off.skip_events, off.skip_rows) == (
        "mysql-bin.000003", 4567, 1, 2,
    )
    assert StartupOptions.initial().mode == StartupMode.INITIAL
    assert StartupOptions.earliest().mode == StartupMode.EARLIEST
    assert StartupOptions.latest().mode == StartupMode.LATEST


def test_built_source_applies_startup_mode(spark):
    log = scripted_changelog(spark, SF_SMOKE)
    src = (
        MySqlSource.builder()
        .startup_options(StartupOptions.specific_offset(file="log.000001", pos=500))
        .build()
    )
    out = src.apply_startup(log)
    assert out.agg(F.min("_seq")).collect()[0][0] == 501


def test_deserializer_plug_point(spark):
    """Json deserializer = wire passthrough; RowData deserializer = typed
    changelog — the same two stock schemas the reference ships."""
    log = normalize_upsert(upsert_log(spark), ["k"])
    wire = to_debezium_json(log, ["k", "v"])

    json_src = (
        MySqlSource.builder()
        .deserializer(JsonDebeziumDeserializationSchema())
        .build()
    )
    assert json_src.deserialize(wire).columns == wire.columns

    typed_src = (
        MySqlSource.builder()
        .deserializer(RowDataDeserializationSchema(log.select("k", "v").schema))
        .build()
    )
    dec = typed_src.deserialize(wire)
    got = {(r["k"], r["v"]) for r in materialize(dec, ["k"]).collect()}
    assert got == {(1, 20.0), (3, 9.0), (4, 4.0)}


def test_postgres_and_mongo_builders():
    pg = (
        PostgresSource.builder()
        .hostname("pg")
        .decoding_plugin_name("pgoutput")
        .slot_name("flink_slot")
        .changelog_mode_option("upsert")
        .build()
    )
    assert pg.connector == "postgres-cdc"
    assert pg.config.debezium_properties["plugin.name"] == "pgoutput"
    assert pg.config.debezium_properties["slot.name"] == "flink_slot"
    assert pg.config.debezium_properties["changelog.mode"] == "upsert"
    with pytest.raises(ValueError, match="changelog-mode"):
        PostgresSource.builder().changelog_mode_option("partial")

    mg = MongoDBSource.builder().copy_existing(True).build()
    assert mg.connector == "mongodb-cdc"
    assert mg.config.debezium_properties["copy.existing"] == "true"


def test_all_connector_builders():
    from flink_cdc_2_3_0_src_spark.sources.api import (
        Db2Source,
        OceanBaseSource,
        OracleSource,
        SqlServerSource,
        TiDBSource,
    )
    import pytest as _pytest

    ora = OracleSource.builder().schema_list("HR", "SALES").database("ORCLCDB").build()
    assert ora.connector == "oracle-cdc"
    assert ora.config.debezium_properties["schema.whitelist"] == "HR,SALES"

    assert SqlServerSource.builder().database("db").build().connector == "sqlserver-cdc"
    assert Db2Source.builder().database("db").build().connector == "db2-cdc"

    tidb = (
        TiDBSource.builder()
        .pd_addresses("pd0:2379,pd1:2379")
        .startup_options(StartupOptions.latest())
        .build()
    )
    assert tidb.connector == "tidb-cdc"
    with _pytest.raises(ValueError, match="tidb-cdc supports"):
        TiDBSource.builder().startup_options(
            StartupOptions.timestamp(1)
        ).build()

    ob = (
        OceanBaseSource.builder()
        .log_proxy_host("lp").log_proxy_port(2983).tenant_name("sys")
        .build()
    )
    assert ob.connector == "oceanbase-cdc"
    assert ob.config.debezium_properties["tenant-name"] == "sys"


def test_builder_config_drives_chunked_snapshot(spark):
    """End-to-end §3.2 story: a source built with the fluent API drives
    the chunk planner exactly as its options say — custom chunk key
    column and split size land in the executed snapshot plan."""
    from flink_cdc_2_3_0_src_spark.sources.parquet_dialect import ParquetTableSource

    src = (
        MySqlSource.builder()
        .database_list("testdb")
        .table_list("testdb.orders")
        .chunk_key_column("o_custkey")
        .split_size(400)
        .build()
    )
    c = src.config
    pts = ParquetTableSource(
        spark,
        SF_SMOKE,
        "orders",
        split_key=c.chunk_key_column,
        chunk_size=c.chunk_size,
    )
    splits = pts.planner().plan_splits()
    assert len(splits) > 1
    # non-unique custkey chunking still partitions exactly
    assert pts.chunked_scan(splits).count() == pts.raw().count()


def test_builder_with_canal_and_maxwell_deserializers(spark):
    """The pluggable-deserializer seam accepts the canal/maxwell format
    schemas: a builder-configured source decodes those topics into the
    standard changelog shape."""
    import json

    from pyspark.sql import types as T

    from flink_cdc_2_3_0_src_spark.sources.api import (
        CanalJsonDeserializationSchema,
        MaxwellJsonDeserializationSchema,
    )

    payload = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    canal_raw = spark.createDataFrame(
        [
            (
                json.dumps(
                    {"data": [{"id": 1, "v": 2.0}], "old": None,
                     "type": "INSERT", "ts": 7}
                ),
            )
        ],
        "value string",
    )
    out = CanalJsonDeserializationSchema(payload).apply(canal_raw, None)
    assert [(r["id"], r["v"], r["_op"]) for r in out.collect()] == [(1, 2.0, "+I")]

    mx_raw = spark.createDataFrame(
        [
            (
                json.dumps(
                    {"database": "d", "table": "t", "type": "delete",
                     "ts": 9, "data": {"id": 3, "v": 1.0}}
                ),
            )
        ],
        "value string",
    )
    out = MaxwellJsonDeserializationSchema(payload).apply(mx_raw, None)
    assert [(r["id"], r["_op"]) for r in out.collect()] == [(3, "-D")]
