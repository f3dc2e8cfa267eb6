"""Kafka + Debezium ingestion path (the BASELINE.json documented
approach: "Structured Streaming + JDBC/Kafka sources").

For databases where we don't tail the log ourselves (Postgres/SQLServer/
Db2 in the reference's legacy path, §3.3), the production route is
Debezium Server/Connect → Kafka topic → Structured Streaming:

    stream = debezium_kafka_stream(spark, opts, payload_schema)

yields the same changelog DataFrame shape (+I/-U/+U/-D rows with _seq)
as every other source in this engine, so the downstream operator layer
(materialize / signed aggs / upsert sink) is source-agnostic.

No Kafka broker exists in this container; the envelope decoding chain is
the same `from_debezium_json` used (and oracle-verified) by the test
dialect, and option building is unit-tested. The `value` column path is
also exercised end-to-end by tests via a file-backed stand-in stream.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_cdc_2_3_0_src_spark.config import SourceConfig
from flink_cdc_2_3_0_src_spark.functions.debezium import from_debezium_json
from flink_cdc_2_3_0_src_spark.model import StartupMode


def specific_offsets_json(offsets: dict[str, dict[int, int]]) -> str:
    """``{topic: {partition: offset}}`` → the Kafka source's
    ``startingOffsets`` JSON (A21 specific-offset for the Kafka path;
    reference StartupOptions.java:29-95 ``specificOffset``).  Keys are
    emitted in sorted order so the option string is deterministic;
    offset -2 (earliest) / -1 (latest) sentinels pass through."""
    import json

    return json.dumps(
        {
            t: {str(p): int(o) for p, o in sorted(parts.items())}
            for t, parts in sorted(offsets.items())
        },
        separators=(",", ":"),
    )


def kafka_options(
    config: SourceConfig,
    topic: str,
    bootstrap_servers: str,
    specific_offsets: Optional[dict[str, dict[int, int]]] = None,
) -> dict[str, str]:
    """Map our startup modes onto Kafka source options (A21 for the
    Kafka path): initial/earliest → earliest offsets, latest → latest;
    timestamp → startingTimestamp (broker-side lookup);
    specific-offset → per-partition startingOffsets JSON."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "failOnDataLoss": "false",
        "maxOffsetsPerTrigger": str(config.fetch_size * 1024),
    }
    mode = config.startup_mode
    if mode in (StartupMode.INITIAL, StartupMode.EARLIEST):
        opts["startingOffsets"] = "earliest"
    elif mode == StartupMode.LATEST:
        opts["startingOffsets"] = "latest"
    elif mode == StartupMode.TIMESTAMP:
        if config.startup_timestamp_ms is None:
            raise ValueError("timestamp startup requires startup_timestamp_ms")
        opts["startingTimestamp"] = str(config.startup_timestamp_ms)
    elif mode == StartupMode.SPECIFIC_OFFSET:
        if not specific_offsets:
            raise ValueError(
                "specific-offset startup on the Kafka path requires a "
                "{topic: {partition: offset}} map"
            )
        opts["startingOffsets"] = specific_offsets_json(specific_offsets)
    return opts


def filter_from_offsets(
    df: DataFrame,
    offsets: dict[str, dict[int, int]],
    topic_col: str = "topic",
    partition_col: str = "partition",
    offset_col: str = "offset",
) -> DataFrame:
    """Client-side enforcement of the same specific-offset semantics the
    broker applies (row kept iff its offset >= the start offset of its
    (topic, partition)).  Used by the file-backed stand-in streams — and
    as the documented semantics contract for ``specific_offsets_json``.

    Spark's Kafka source REJECTS a startingOffsets JSON that omits any
    partition of a subscribed topic, so the stand-in enforces the same
    completeness up front (one tiny distinct over (topic, partition))
    instead of silently defaulting absent partitions — a stand-in that
    passed on partial maps would validate configs the real path refuses."""
    present = {
        (r[0], int(r[1]))
        for r in df.select(topic_col, partition_col).distinct().collect()
    }
    listed = {(t, int(p)) for t, parts in offsets.items() for p in parts}
    missing = sorted(
        (t, p) for (t, p) in present if t in offsets and (t, p) not in listed
    )
    if missing:
        raise ValueError(
            "startingOffsets must list every partition of a subscribed "
            f"topic (Spark's Kafka source enforces this); missing: {missing}"
        )
    cond = F.lit(False)
    has_rule = F.lit(False)
    for t, parts in offsets.items():
        for p, o in parts.items():
            match = (F.col(topic_col) == t) & (F.col(partition_col) == int(p))
            has_rule = has_rule | match
            if int(o) == -2:  # earliest
                cond = cond | match
            elif int(o) == -1:  # latest: nothing historical
                pass
            else:
                cond = cond | (match & (F.col(offset_col) >= int(o)))
    # rows of topics not in the map at all (unsubscribed in this config)
    return df.filter(cond | ~has_rule)


def decode_debezium_values(
    values: DataFrame, payload_schema: T.StructType, value_col: str = "value"
) -> DataFrame:
    """Kafka value bytes/strings → changelog rows (+I/-U/+U/-D, _seq).

    The exact decode chain oracle-verified by cdc_dbz_roundtrip.
    """
    df = values
    if isinstance(df.schema[value_col].dataType, T.BinaryType):
        df = df.withColumn(value_col, F.col(value_col).cast("string"))
    return from_debezium_json(df, payload_schema, value_col)


def debezium_kafka_stream(
    spark: SparkSession,
    config: SourceConfig,
    topic: str,
    bootstrap_servers: str,
    payload_schema: T.StructType,
) -> DataFrame:
    """readStream from a Debezium topic → changelog DataFrame."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_options(config, topic, bootstrap_servers).items():
        reader = reader.option(k, v)
    raw = reader.load()  # key, value, topic, partition, offset, timestamp
    return decode_debezium_values(raw.select("value"), payload_schema)
