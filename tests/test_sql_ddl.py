"""§3.1 SQL DDL entry point: CREATE TABLE ... WITH ('connector'=...)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from flink_cdc_2_3_0_src_spark.sources.sql_ddl import (
    FACTORIES,
    create_table_source,
    parse_with_options,
)

MYSQL_DDL = """
CREATE TABLE orders_src (
    db_name STRING METADATA FROM 'database_name' VIRTUAL,
    table_name STRING METADATA VIRTUAL,
    op_ts TIMESTAMP_LTZ(3) METADATA FROM 'op_ts' VIRTUAL,
    order_id BIGINT NOT NULL,
    customer ROW<name STRING, nation INT>,
    amounts ARRAY<DECIMAL(10, 2)>,
    attrs MAP<STRING, STRING>,
    note STRING COMMENT 'it''s a note, with a comma',
    created TIMESTAMP(3),
    PRIMARY KEY (order_id) NOT ENFORCED
) WITH (
    'connector' = 'mysql-cdc',
    'hostname' = 'db.example',
    'port' = '3307',
    'database-name' = 'app_db',
    'table-name' = 'app_db\\.orders_.*',
    'server-id' = '5400-5404',
    'scan.incremental.snapshot.chunk.size' = '4096',
    'scan.startup.mode' = 'initial'
)
"""


def test_mysql_ddl_full_resolution():
    rt = create_table_source(MYSQL_DDL)
    assert rt.name == "orders_src" and rt.connector == "mysql-cdc"
    assert rt.primary_key == ["order_id"]
    f = {x.name: x for x in rt.physical_schema.fields}
    assert set(f) == {"order_id", "customer", "amounts", "attrs", "note", "created"}
    assert isinstance(f["order_id"].dataType, T.LongType) and not f["order_id"].nullable
    assert f["customer"].dataType == T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("nation", T.IntegerType()),
        ]
    )
    assert f["amounts"].dataType == T.ArrayType(T.DecimalType(10, 2))
    assert isinstance(f["created"].dataType, T.TimestampNTZType)
    # metadata plan: FROM key, bare-name fallback, op_ts — in order
    assert rt.metadata_columns == [
        ("db_name", "database_name"),
        ("table_name", "table_name"),
        ("op_ts", "op_ts"),
    ]
    # the factory routed the options into the SAME SourceConfig the
    # DataStream builder produces
    c = rt.source.config
    assert c.hostname == "db.example" and c.port == 3307
    assert c.chunk_size == 4096 and c.server_id == "5400-5404"


def test_metadata_projection(spark):
    from flink_cdc_2_3_0_src_spark.operators.changelog import append_metadata

    rt = create_table_source(MYSQL_DDL)
    df = spark.createDataFrame([(1,)], "order_id long")
    decoded = append_metadata(
        df, database="app_db", table="orders_1", op_ts_col="_op_ts"
    )
    out = rt.append_metadata(decoded)
    r = out.collect()[0]
    assert (r["db_name"], r["table_name"]) == ("app_db", "orders_1")
    assert r["op_ts"].timestamp() == 0  # snapshot rows: epoch 0


def test_unknown_connector_lists_identifiers():
    with pytest.raises(ValueError, match="could not find a factory"):
        create_table_source(
            "CREATE TABLE t (id INT) WITH ('connector' = 'no-such-cdc')"
        )


def test_dialect_metadata_keys_validated():
    # tenant_name is OceanBase-only
    with pytest.raises(ValueError, match="tenant_name"):
        create_table_source(
            "CREATE TABLE t (tn STRING METADATA FROM 'tenant_name', id INT) "
            "WITH ('connector' = 'mysql-cdc')"
        )
    rt = create_table_source(
        "CREATE TABLE t (tn STRING METADATA FROM 'tenant_name', id INT) "
        "WITH ('connector' = 'oceanbase-cdc', 'tenant-name' = 'sys')"
    )
    assert rt.metadata_columns == [("tn", "tenant_name")]
    assert rt.source.config.tenant_name == "sys"
    # Oracle exposes schema_name; Mongo uses collection_name
    rt2 = create_table_source(
        "CREATE TABLE t (sn STRING METADATA FROM 'schema_name', id INT) "
        "WITH ('connector' = 'oracle-cdc', 'schema-name' = 'INVENTORY')"
    )
    assert rt2.source.config.schema_name == "INVENTORY"
    with pytest.raises(ValueError, match="collection_name"):
        create_table_source(
            "CREATE TABLE t (c STRING METADATA FROM 'table_name', id INT) "
            "WITH ('connector' = 'mongodb-cdc')"
        )


def test_computed_column_parsed_and_excluded_from_physical_schema():
    # the reference excludes computed columns from the physical row
    # (MySqlTableSourceFactory.java:101-102, Column.isPhysical()); the
    # expression is applied as a post-decode projection
    rt = create_table_source(
        "CREATE TABLE t (id INT, price DECIMAL(10,2), qty INT, "
        "total AS price * qty, "
        "total_sq AS total * total COMMENT 'refs an earlier computed col') "
        "WITH ('connector' = 'mysql-cdc')"
    )
    assert rt.physical_schema.fieldNames() == ["id", "price", "qty"]
    assert rt.computed_columns == [
        ("total", "price * qty"),
        ("total_sq", "total * total"),
    ]


def test_computed_column_applied_in_order(spark):
    rt = create_table_source(
        "CREATE TABLE t (id INT, price DOUBLE, qty INT, "
        "total AS price * qty, total_sq AS total * total) "
        "WITH ('connector' = 'mysql-cdc')"
    )
    df = spark.createDataFrame([(1, 2.5, 4)], "id int, price double, qty int")
    r = rt.apply_computed(df).collect()[0]
    assert (r["total"], r["total_sq"]) == (10.0, 100.0)


def test_proctime_computed_column_maps_to_current_timestamp(spark):
    """A Flink DDL's ``proc AS PROCTIME()`` decodes end-to-end as a
    processing-time (wall-clock) timestamp column.  Semantic note
    pinned here: Spark evaluates current_timestamp() at query start
    (constant within the batch) while Flink stamps each row at
    operator-evaluation time — both honor the attribute's contract
    (wall-clock-when-processed, NOT event time).  The reference never
    materializes the column either (planner-delegated,
    MySqlTableSourceFactory.java:101-102)."""
    import datetime

    rt = create_table_source(
        "CREATE TABLE t (id INT, pt AS PROCTIME()) "
        "WITH ('connector' = 'mysql-cdc')"
    )
    assert rt.physical_schema.fieldNames() == ["id"]
    assert rt.computed_columns == [("pt", "current_timestamp()")]
    df = spark.createDataFrame([(1,), (2,)], "id int")
    rows = rt.apply_computed(df).collect()
    assert all(isinstance(r["pt"], datetime.datetime) for r in rows)
    # constant within the query — the documented Spark-side semantics
    assert rows[0]["pt"] == rows[1]["pt"]
    # PROCTIME composes inside a larger expression too
    rt2 = create_table_source(
        "CREATE TABLE t (id INT, d AS CAST(PROCTIME() AS DATE)) "
        "WITH ('connector' = 'mysql-cdc')"
    )
    assert rt2.computed_columns == [("d", "CAST(current_timestamp() AS DATE)")]


def test_proctime_with_arguments_rejected():
    with pytest.raises(ValueError, match="no arguments"):
        create_table_source(
            "CREATE TABLE t (id INT, pt AS PROCTIME(id)) "
            "WITH ('connector' = 'mysql-cdc')"
        )


def test_computed_column_comment_stripped_but_literal_kept():
    rt = create_table_source(
        "CREATE TABLE t (id INT, "
        "tag AS CONCAT('a COMMENT ''x''', '-b') COMMENT 'real comment') "
        "WITH ('connector' = 'mysql-cdc')"
    )
    assert rt.computed_columns == [("tag", "CONCAT('a COMMENT ''x''', '-b')")]


def test_duplicate_column_names_rejected():
    with pytest.raises(ValueError, match="duplicate"):
        create_table_source(
            "CREATE TABLE t (id INT, id AS 1 + 1) "
            "WITH ('connector' = 'mysql-cdc')"
        )


def test_pk_must_name_physical_columns():
    with pytest.raises(ValueError, match="PRIMARY KEY"):
        create_table_source(
            "CREATE TABLE t (id INT, PRIMARY KEY (nope) NOT ENFORCED) "
            "WITH ('connector' = 'mysql-cdc')"
        )


def test_with_options_quote_escapes():
    opts = parse_with_options("'password' = 'it''s', 'a' = 'b'")
    assert opts == {"password": "it's", "a": "b"}


def test_every_factory_identifier_builds():
    for ident in FACTORIES:
        rt = create_table_source(
            f"CREATE TABLE t (id BIGINT NOT NULL, PRIMARY KEY (id) NOT ENFORCED) "
            f"WITH ('connector' = '{ident}')"
        )
        assert rt.source.connector == ident
        assert rt.physical_schema.fieldNames() == ["id"]


def test_comment_containing_as_is_not_a_computed_column():
    rt = create_table_source(
        "CREATE TABLE t (id INT, note STRING COMMENT 'used AS a label') "
        "WITH ('connector' = 'mysql-cdc')"
    )
    assert rt.physical_schema.fieldNames() == ["id", "note"]


def test_flink_type_timezone_mid_precision_forms():
    from flink_cdc_2_3_0_src_spark.types import flink_type_to_spark as f

    assert isinstance(f("TIMESTAMP(3) WITH LOCAL TIME ZONE"), T.TimestampType)
    assert isinstance(f("TIMESTAMP(6) WITHOUT TIME ZONE"), T.TimestampNTZType)
    assert isinstance(f("TIMESTAMP_LTZ(3)"), T.TimestampType)
    assert isinstance(f("TIME(0) WITHOUT TIME ZONE"), T.IntegerType)


def test_mongo_copy_existing_options_via_ddl():
    rt = create_table_source(
        "CREATE TABLE t (id BIGINT NOT NULL, PRIMARY KEY (id) NOT ENFORCED) "
        "WITH ('connector' = 'mongodb-cdc', "
        "'copy.existing' = 'true', "
        "'copy.existing.pipeline' = '[{\"$match\": {\"closed\": false}}]', "
        "'copy.existing.queue.size' = '16384')"
    )
    c = rt.source.config
    assert c.copy_existing and c.copy_existing_queue_size == 16384
    assert "closed" in c.copy_existing_pipeline


def test_watermark_clause_parsed_and_mapped():
    rt = create_table_source(
        "CREATE TABLE t (id BIGINT NOT NULL, ts TIMESTAMP_LTZ(3), "
        "WATERMARK FOR ts AS ts - INTERVAL '5' SECOND, "
        "PRIMARY KEY (id) NOT ENFORCED) "
        "WITH ('connector' = 'mysql-cdc')"
    )
    assert rt.watermark == ("ts", "5 seconds")
    # physical schema is unaffected by the watermark declaration
    assert rt.physical_schema.fieldNames() == ["id", "ts"]
    rt2 = create_table_source(
        "CREATE TABLE t (id INT, op_ts TIMESTAMP_LTZ(3) METADATA FROM 'op_ts', "
        "WATERMARK FOR op_ts AS op_ts - INTERVAL '30' MINUTES) "
        "WITH ('connector' = 'mysql-cdc')"
    )
    assert rt2.watermark == ("op_ts", "30 minutes")


def test_watermark_fractional_nonsecond_normalized_to_ms(spark):
    """Flink accepts INTERVAL '2.5' MINUTE; Spark's interval parser only
    takes fractions on SECOND — the DDL normalizes to milliseconds and
    the result must be accepted by a real withWatermark call."""
    rt = create_table_source(
        "CREATE TABLE t (id INT, ts TIMESTAMP_LTZ(3), "
        "WATERMARK FOR ts AS ts - INTERVAL '2.5' MINUTES) "
        "WITH ('connector' = 'mysql-cdc')"
    )
    assert rt.watermark == ("ts", "150000 milliseconds")
    df = spark.createDataFrame([(1,)], "id int").selectExpr(
        "current_timestamp() as ts"
    )
    rt.apply_watermark(df)  # must not raise
    # fractional seconds pass through untouched (Spark parses those)
    rt2 = create_table_source(
        "CREATE TABLE t (id INT, ts TIMESTAMP_LTZ(3), "
        "WATERMARK FOR ts AS ts - INTERVAL '0.5' SECOND) "
        "WITH ('connector' = 'mysql-cdc')"
    )
    assert rt2.watermark == ("ts", "0.5 seconds")
    rt2.apply_watermark(df)
    with pytest.raises(ValueError, match="finer than"):
        create_table_source(
            "CREATE TABLE t (id INT, ts TIMESTAMP_LTZ(3), "
            "WATERMARK FOR ts AS ts - INTERVAL '0.0000001' MINUTE) "
            "WITH ('connector' = 'mysql-cdc')"
        )


def test_watermark_rejects_non_canonical_or_unknown():
    with pytest.raises(ValueError, match="WATERMARK expression"):
        create_table_source(
            "CREATE TABLE t (id INT, ts TIMESTAMP(3), "
            "WATERMARK FOR ts AS some_udf(ts)) "
            "WITH ('connector' = 'mysql-cdc')"
        )
    with pytest.raises(ValueError, match="not a declared column"):
        create_table_source(
            "CREATE TABLE t (id INT, ts TIMESTAMP(3), "
            "WATERMARK FOR nope AS nope - INTERVAL '5' SECOND) "
            "WITH ('connector' = 'mysql-cdc')"
        )


def test_apply_watermark_on_stream(spark):
    rt = create_table_source(
        "CREATE TABLE t (value BIGINT, timestamp TIMESTAMP_LTZ(3), "
        "WATERMARK FOR timestamp AS timestamp - INTERVAL '10' SECOND) "
        "WITH ('connector' = 'mysql-cdc')"
    )
    stream = spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    out = rt.apply_watermark(stream)
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "EventTimeWatermark" in analyzed and "10 seconds" in analyzed
    # DDL without a watermark: identity
    rt0 = create_table_source(
        "CREATE TABLE t (id INT) WITH ('connector' = 'mysql-cdc')"
    )
    assert rt0.watermark is None and rt0.apply_watermark(stream) is stream
