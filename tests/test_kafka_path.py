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

    with pytest.raises(ValueError, match="specific-offset"):
        kafka_options(SourceConfig(startup_mode=StartupMode.SPECIFIC_OFFSET), "t", "b")


def test_kafka_specific_offsets_json():
    from flink_cdc_2_3_0_src_spark.sources.kafka import specific_offsets_json

    j = specific_offsets_json({"shop.orders": {1: 77, 0: 23}, "a": {0: -2, 2: -1}})
    # deterministic key order; sentinels (-2 earliest / -1 latest) pass
    assert j == '{"a":{"0":-2,"2":-1},"shop.orders":{"0":23,"1":77}}'

    cfg = SourceConfig(startup_mode=StartupMode.SPECIFIC_OFFSET)
    opts = kafka_options(
        cfg, "shop.orders", "b:9092", specific_offsets={"shop.orders": {0: 23}}
    )
    assert opts["startingOffsets"] == '{"shop.orders":{"0":23}}'


def test_kafka_specific_offset_stream_resume(spark, tmp_path):
    """File-backed stand-in for a mid-stream resume: envelopes carry
    (topic, partition, offset) like the Kafka source schema; the
    specific-offset filter must admit exactly the records at/after the
    per-partition start offsets, and the decoded changelog must
    materialize to the suffix state."""
    from flink_cdc_2_3_0_src_spark.sources.kafka import filter_from_offsets

    log = scripted_changelog(spark, SF_SMOKE).select("user_id", "value", "_op", "_seq")
    norm = normalize_upsert(log, ["user_id"])
    enc = to_debezium_json(norm, ["user_id", "value"])
    # two partitions keyed by user_id parity; offset = _seq
    topic = enc.select(
        F.lit("shop.orders").alias("topic"),
        (F.col("_seq") % 2).cast("int").alias("partition"),
        F.col("_seq").alias("offset"),
        F.col("value").cast("binary").alias("value"),
    )
    cut = {"shop.orders": {0: 300, 1: 500}}
    resumed = filter_from_offsets(topic, cut)
    decoded = decode_debezium_values(resumed.select("value"), norm.select("user_id", "value").schema)
    got = {
        (r["user_id"], r["value"])
        for r in materialize(decoded, ["user_id"]).collect()
    }
    # oracle: same cut applied to the raw changelog
    suffix = log.filter(
        ((F.col("_seq") % 2 == 0) & (F.col("_seq") >= 300))
        | ((F.col("_seq") % 2 == 1) & (F.col("_seq") >= 500))
    )
    expect = {
        (r["user_id"], r["value"]) for r in materialize(suffix, ["user_id"]).collect()
    }
    assert got == expect
    assert len(got) > 0


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
