"""A21/B9 startup-mode branches + B10 binary split-key ordering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_cdc_2_3_0_src_spark.config import SourceConfig
from flink_cdc_2_3_0_src_spark.model import ChunkRange, StartupMode
from flink_cdc_2_3_0_src_spark.sources.scripted_log import scripted_changelog
from flink_cdc_2_3_0_src_spark.streaming.startup import apply_startup_mode
from tests.conftest import SF_SMOKE


def test_earliest_returns_full_log(spark):
    log = scripted_changelog(spark, SF_SMOKE)
    out = apply_startup_mode(log, SourceConfig(startup_mode=StartupMode.EARLIEST))
    assert out.count() == log.count()


def test_latest_returns_nothing_at_tip(spark):
    log = scripted_changelog(spark, SF_SMOKE)
    out = apply_startup_mode(log, SourceConfig(startup_mode=StartupMode.LATEST))
    assert out.count() == 0  # nothing after the current tip
    # with an explicit older tip, only newer events flow
    out2 = apply_startup_mode(
        log, SourceConfig(startup_mode=StartupMode.LATEST), current_tip=900
    )
    assert out2.count() == log.filter(F.col("_seq") > 900).count()


def test_specific_offset_exclusive(spark):
    log = scripted_changelog(spark, SF_SMOKE)
    cfg = SourceConfig(
        startup_mode=StartupMode.SPECIFIC_OFFSET, startup_specific_offset_pos=500
    )
    out = apply_startup_mode(log, cfg)
    assert out.agg(F.min("_seq")).collect()[0][0] == 501


def test_specific_offset_missing_pos_raises(spark):
    log = scripted_changelog(spark, SF_SMOKE)
    with pytest.raises(ValueError, match="position"):
        apply_startup_mode(
            log, SourceConfig(startup_mode=StartupMode.SPECIFIC_OFFSET)
        )


def test_binary_split_key_ordering(spark):
    """B10: VARBINARY PK chunking — bytewise range predicates partition
    a binary key space exactly (reference testPrimaryKeyWithVarbinaryType,
    MySqlConnectorITCase.java:969-1042)."""
    rows = [(bytes([i, 255 - i]),) for i in range(50)]
    df = spark.createDataFrame(rows, "k binary")
    boundaries = [bytes([10, 0]), bytes([30, 0])]
    chunks = [
        ChunkRange(None, boundaries[0]),
        ChunkRange(boundaries[0], boundaries[1]),
        ChunkRange(boundaries[1], None),
    ]
    total = 0
    for c in chunks:
        # predicate_sql renders X'...' hex literals — Spark accepts them
        n = df.filter(F.expr(c.predicate_sql("k"))).count()
        total += n
        assert n > 0
    assert total == df.count()
    # containment agrees with the SQL predicate
    for c in chunks:
        for (k,) in rows:
            in_sql = df.filter(
                (F.col("k") == F.lit(k)) & F.expr(c.predicate_sql("k"))
            ).count() == 1
            assert c.contains(k) == in_sql
