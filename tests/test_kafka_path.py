"""Kafka-Debezium ingestion path: option mapping + decode chain through
a file-backed stand-in for the topic."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_cdc_2_3_0_src_spark.config import SourceConfig
from flink_cdc_2_3_0_src_spark.model import StartupMode
from flink_cdc_2_3_0_src_spark.operators.changelog import materialize, normalize_upsert
from flink_cdc_2_3_0_src_spark.functions.debezium import to_debezium_json
from flink_cdc_2_3_0_src_spark.sources.kafka import (
    decode_debezium_values,
    kafka_options,
)
from flink_cdc_2_3_0_src_spark.sources.scripted_log import scripted_changelog
from tests.conftest import SF_SMOKE


def test_kafka_option_mapping():
    cfg = SourceConfig(startup_mode=StartupMode.EARLIEST, fetch_size=1024)
    opts = kafka_options(cfg, "shop.orders", "k1:9092,k2:9092")
    assert opts["startingOffsets"] == "earliest"
    assert opts["subscribe"] == "shop.orders"
    assert opts["kafka.bootstrap.servers"] == "k1:9092,k2:9092"

    cfg2 = SourceConfig(
        startup_mode=StartupMode.TIMESTAMP, startup_timestamp_ms=1700000000000
    )
    assert kafka_options(cfg2, "t", "b")["startingTimestamp"] == "1700000000000"

    with pytest.raises(ValueError, match="startingOffsets"):
        kafka_options(SourceConfig(startup_mode=StartupMode.SPECIFIC_OFFSET), "t", "b")


def test_kafka_value_decode_roundtrip(spark):
    """Envelope strings, as they'd arrive in the Kafka `value` column
    (binary), decode to the same materialized state."""
    log = scripted_changelog(spark, SF_SMOKE).select("user_id", "value", "_op", "_seq")
    norm = normalize_upsert(log, ["user_id"])
    enc = to_debezium_json(norm, ["user_id", "value"])
    # Kafka delivers value as BINARY
    as_kafka = enc.select(F.col("value").cast("binary").alias("value"))
    decoded = decode_debezium_values(as_kafka, norm.select("user_id", "value").schema)
    got = {(r["user_id"], r["value"]) for r in materialize(decoded, ["user_id"]).collect()}
    expect = {
        (r["user_id"], r["value"]) for r in materialize(log, ["user_id"]).collect()
    }
    assert got == expect
