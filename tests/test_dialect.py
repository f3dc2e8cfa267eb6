"""Unit tests: type mapping (§1.4), config validation (A33), JDBC
dialect planning against a scripted SQL runner (A1/A2/A4)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from flink_cdc_2_3_0_src_spark.config import SourceConfig
from flink_cdc_2_3_0_src_spark.model import StartupMode, TableId
from flink_cdc_2_3_0_src_spark.sources.jdbc import JdbcDialect
from flink_cdc_2_3_0_src_spark.types import mysql_type_to_spark


@pytest.mark.parametrize(
    "decl,expected",
    [
        ("TINYINT(1)", T.BooleanType()),
        ("BOOLEAN", T.BooleanType()),
        ("TINYINT", T.ByteType()),
        ("TINYINT UNSIGNED", T.ShortType()),
        ("SMALLINT", T.ShortType()),
        ("SMALLINT UNSIGNED", T.IntegerType()),
        ("INT", T.IntegerType()),
        ("INT UNSIGNED", T.LongType()),
        ("BIGINT", T.LongType()),
        ("BIGINT UNSIGNED", T.DecimalType(20, 0)),
        ("SERIAL", T.DecimalType(20, 0)),
        ("DECIMAL(10,2)", T.DecimalType(10, 2)),
        ("NUMERIC(38,10)", T.DecimalType(38, 10)),
        ("DECIMAL(45,10)", T.StringType()),  # p>38 → STRING
        ("FLOAT", T.FloatType()),
        ("DOUBLE", T.DoubleType()),
        ("DATE", T.DateType()),
        ("TIME(3)", T.IntegerType()),  # millis-of-day convention
        ("DATETIME(6)", T.TimestampNTZType()),
        ("TIMESTAMP", T.TimestampNTZType()),
        ("VARCHAR(255)", T.StringType()),
        ("TEXT", T.StringType()),
        ("VARBINARY(16)", T.BinaryType()),
        ("BLOB", T.BinaryType()),
        ("ENUM('a','b')", T.StringType()),
        ("JSON", T.StringType()),
        ("GEOMETRY", T.StringType()),
    ],
)
def test_mysql_type_mapping(decl, expected):
    assert mysql_type_to_spark(decl) == expected


def test_config_validation_errors():
    with pytest.raises(ValueError, match="chunk.size"):
        SourceConfig(chunk_size=0).validate()
    with pytest.raises(ValueError, match="regex"):
        SourceConfig(table_list=["db.(unclosed"]).validate()
    with pytest.raises(ValueError, match="server-id"):
        SourceConfig(server_id="abc").validate()
    with pytest.raises(ValueError, match="parallelism"):
        SourceConfig(server_id="5400-5401", parallelism=4).validate()
    with pytest.raises(ValueError, match="specific-offset"):
        SourceConfig(startup_mode=StartupMode.SPECIFIC_OFFSET).validate()
    with pytest.raises(ValueError, match="timestamp"):
        SourceConfig(startup_mode=StartupMode.TIMESTAMP).validate()
    # valid config passes
    SourceConfig(server_id="5400-5404", parallelism=4).validate()


def test_config_from_reference_options():
    c = SourceConfig.from_options(
        {
            "hostname": "db.example",
            "port": "3307",
            "database-name": "app_db",
            "table-name": "app_db\\.orders_.*",
            "scan.incremental.snapshot.chunk.size": "4096",
            "scan.startup.mode": "timestamp",
            "scan.startup.timestamp-millis": "1700000000000",
            "server-id": "5400-5408",
            "connect.timeout": "45s",
        }
    )
    assert c.port == 3307 and c.chunk_size == 4096
    assert c.startup_mode == StartupMode.TIMESTAMP
    assert c.startup_timestamp_ms == 1700000000000
    assert c.connect_timeout_sec == 45
    c.parallelism = 8
    c.validate()


def test_config_specific_offset_skip_counters_and_startup_offset():
    c = SourceConfig.from_options(
        {
            "scan.startup.mode": "specific-offset",
            "scan.startup.specific-offset.file": "mysql-bin.000003",
            "scan.startup.specific-offset.pos": "4567",
            "scan.startup.specific-offset.skip-events": "2",
            "scan.startup.specific-offset.skip-rows": "7",
        }
    ).validate()
    off = c.startup_offset()
    assert (off.file, off.pos, off.skip_events, off.skip_rows) == (
        "mysql-bin.000003",
        4567,
        2,
        7,
    )
    # skip-counters participate in the A22 total order after file/pos
    from flink_cdc_2_3_0_src_spark.model import BinlogOffset

    assert off > BinlogOffset(file="mysql-bin.000003", pos=4567, skip_events=2, skip_rows=6)
    # other modes have no specific offset
    assert SourceConfig().startup_offset() is None
    with pytest.raises(ValueError, match="skip-events"):
        SourceConfig(startup_specific_skip_events=-1).validate()


def test_config_debezium_passthrough():
    c = SourceConfig.from_options(
        {
            "chunk-meta.group.size": "500",
            "debezium.decimal.handling.mode": "string",
            "debezium.column.include.list": "db.orders.id, db.orders.total",
            "debezium.snapshot.select.statement.overrides": "db.orders",
            "debezium.snapshot.select.statement.overrides.db.orders":
                "SELECT * FROM db.orders WHERE deleted = 0",
            "debezium.max.batch.size": "4096",
        }
    ).validate()
    assert c.chunk_meta_group_size == 500
    assert c.decimal_handling_mode == "string"
    assert c.column_include_list == ["db.orders.id", "db.orders.total"]
    assert c.snapshot_select_overrides == {
        "db.orders": "SELECT * FROM db.orders WHERE deleted = 0"
    }
    # unrecognized engine keys still land in the passthrough map
    assert c.debezium_properties["max.batch.size"] == "4096"
    with pytest.raises(ValueError, match="decimal.handling.mode"):
        SourceConfig(decimal_handling_mode="exact").validate()

    from flink_cdc_2_3_0_src_spark.functions.converters import (
        connect_decimal_string,
        decimal_converter_for_mode,
    )

    assert decimal_converter_for_mode(c.decimal_handling_mode) is connect_decimal_string
    with pytest.raises(ValueError, match="decimal.handling.mode"):
        decimal_converter_for_mode("exact")


class ScriptedRunner:
    """Fake DB: answers the dialect's SQL by pattern."""

    def __init__(self, keys):
        self.keys = sorted(keys)
        self.log = []

    def __call__(self, sql: str):
        self.log.append(sql)
        s = sql.lower()
        if "information_schema.tables" in s and "table_type" in s:
            return [("app_db", "orders"), ("app_db", "audit"), ("other", "x")]
        if "key_column_usage" in s:
            return [("id",)]
        if "min(" in s:
            return [(self.keys[0], self.keys[-1])]
        if "table_rows" in s:
            return [(len(self.keys),)]
        if "order by" in s and "limit" in s:
            low = int(s.split(">=")[1].split("order")[0].strip())
            limit = int(s.rsplit("limit", 1)[1].split(")")[0].strip())
            window = [k for k in self.keys if k >= low][:limit]
            return [(window[-1] if window else None,)]
        if "show master status" in s:
            return [("mysql-bin.000003", 4567)]
        raise AssertionError(f"unexpected SQL: {sql}")


def test_jdbc_dialect_discovery_and_planning():
    keys = [1, 2, 3, 1000, 1001, 1002, 1003, 5000, 5001, 9999]
    cfg = SourceConfig(
        database_list=["app_db"], table_list=["app_db\\.orders"], chunk_size=4
    )
    d = JdbcDialect(cfg, ScriptedRunner(keys))
    tables = d.discover_tables()
    assert tables == [TableId("app_db", None, "orders")]
    t = tables[0]
    assert d.split_key(t) == "id"
    splits = d.planner(t).plan_splits()
    # sparse keys → uneven path; every key in exactly one chunk
    for k in keys:
        assert sum(1 for s in splits if s.range.contains(k)) == 1
    assert splits[0].range.start is None and splits[-1].range.end is None
    assert d.current_offset() == ("mysql-bin.000003", 4567)


class QuotedStringKeyRunner(ScriptedRunner):
    """Fake DB whose next-chunk-max path PARSES the SQL string literal
    with real quoting rules ('' = escaped quote, trailing garbage =
    syntax error) — so an unescaped data-derived boundary fails the way
    a real database would."""

    def __call__(self, sql: str):
        self.log.append(sql)
        s = sql.lower()
        if "key_column_usage" in s:
            return [("name",)]
        if "min(" in s:
            return [(self.keys[0], self.keys[-1])]
        if "table_rows" in s:
            return [(len(self.keys),)]
        if "order by" in s and "limit" in s:
            frag = sql.split(">=", 1)[1]
            frag = frag[: frag.lower().index("order by")].strip()
            if not frag.startswith("'"):
                raise AssertionError(f"expected quoted literal, got: {frag!r}")
            # real single-quote literal parse: '' is an escaped quote
            out, i = [], 1
            while i < len(frag):
                if frag[i] == "'":
                    if i + 1 < len(frag) and frag[i + 1] == "'":
                        out.append("'")
                        i += 2
                        continue
                    break
                out.append(frag[i])
                i += 1
            else:
                raise AssertionError(f"unterminated string literal: {frag!r}")
            if frag[i + 1 :].strip():
                raise AssertionError(f"syntax error after literal: {frag!r}")
            low = "".join(out)
            limit = int(sql.rsplit("LIMIT", 1)[1].split(")")[0].strip())
            window = [k for k in self.keys if k >= low][:limit]
            return [(window[-1] if window else None,)]
        raise AssertionError(f"unexpected SQL: {sql}")


def test_jdbc_string_key_with_quote_is_escaped():
    """A split key value containing ' must not break (or inject into)
    the next-chunk-max query mid-snapshot (reference uses prepared
    statements, StatementUtils.queryNextChunkMax:99-130)."""
    keys = sorted(["Adams", "Lee", "O'Brien", "O'Connor", "O'Neil", "Smith", "Zhu"])
    cfg = SourceConfig(chunk_size=2)
    d = JdbcDialect(cfg, QuotedStringKeyRunner(keys))
    t = TableId("app_db", None, "customers")
    splits = d.planner(t).plan_splits()
    for k in keys:
        assert sum(1 for s in splits if s.range.contains(k)) == 1
    # boundary literals in the emitted predicates are escaped too
    for s in splits:
        sql = s.range.predicate_sql("`name`")
        assert "O''" in sql or "O'" not in sql


def test_jdbc_no_pk_raises():
    class NoPk(ScriptedRunner):
        def __call__(self, sql):
            if "key_column_usage" in sql.lower():
                return []
            return super().__call__(sql)

    d = JdbcDialect(SourceConfig(), NoPk([1]))
    with pytest.raises(ValueError, match="no primary key"):
        d.split_key(TableId("db", None, "t"))


# ---- dialect breadth: Oracle / SQL Server / Db2 (B15) ----


class OracleRunner:
    """Fake Oracle: ALL_TABLES/ALL_CONSTRAINTS catalogs, FETCH FIRST
    limiting, SCN offset; table HR.ORDERS has no PK -> ROWID fallback."""

    def __init__(self, rowids):
        self.rowids = sorted(rowids)
        self.log = []

    def __call__(self, sql: str):
        self.log.append(sql)
        s = sql.lower()
        assert "limit" not in s, f"Oracle got a LIMIT clause: {sql}"
        if "from all_tables" in s and "owner, table_name" in sql.lower():
            return [("HR", "ORDERS"), ("SYS2", "X")]
        if "all_constraints" in s:
            return []  # no primary key
        if "min(" in s:
            return [(self.rowids[0], self.rowids[-1])]
        if "num_rows" in s:
            return [(len(self.rowids),)]
        if "fetch first" in s and "order by" in s:
            frag = sql.split(">=", 1)[1]
            low = frag[: frag.lower().index("order by")].strip().strip("'")
            n = int(s.split("fetch first", 1)[1].split("rows")[0].strip())
            window = [k for k in self.rowids if k >= low][:n]
            return [(window[-1] if window else None,)]
        if "current_scn" in s:
            return [(773344,)]
        raise AssertionError(f"unexpected SQL: {sql}")


def test_oracle_dialect_rowid_fallback_and_planning():
    from flink_cdc_2_3_0_src_spark.sources.oracle import OracleDialect

    rowids = ["AAA0001", "AAA0002", "AAB0001", "AAC0005", "AAD0009"]
    cfg = SourceConfig(database_list=["HR"], chunk_size=2)
    d = OracleDialect(cfg, OracleRunner(rowids))
    tables = d.discover_tables()
    assert tables == [TableId("HR", None, "ORDERS")]
    t = tables[0]
    # A28: no PK -> ROWID pseudo-column, opaque ordering -> uneven path
    assert d.split_keys(t) == "ROWID"
    splits = d.planner(t).plan_splits()
    for k in rowids:
        assert sum(1 for s in splits if s.range.contains(k)) == 1
    assert d.current_offset() == ("scn", 773344)
    # ROWID must be emitted UNQUOTED (a quoted "ROWID" is ORA-00904 on
    # real Oracle — it resolves to a physical column, not the
    # pseudo-column); bounds are read back through ROWIDTOCHAR.
    assert not any('"ROWID"' in q_ for q_ in d.run_sql.log)
    assert any("ROWIDTOCHAR(ROWID)" in q_ for q_ in d.run_sql.log)
    assert any(" ROWID " in q_ or "(ROWID)" in q_ for q_ in d.run_sql.log)


class SqlServerRunner:
    def __init__(self, keys):
        self.keys = sorted(keys)
        self.log = []

    def __call__(self, sql: str):
        self.log.append(sql)
        s = sql.lower()
        assert "limit" not in s, f"SQL Server got a LIMIT clause: {sql}"
        if "sys.tables" in s:
            return [("dbo", "orders")]
        if "is_primary_key" in s:
            return [("id",)]
        if "min(" in s:
            return [(self.keys[0], self.keys[-1])]
        if "dm_db_partition_stats" in s:
            return [(len(self.keys),)]
        if "fetch next" in s and "order by" in s:
            low = int(sql.split(">=", 1)[1].split("ORDER")[0].strip())
            n = int(s.split("fetch next", 1)[1].split("rows")[0].strip())
            window = [k for k in self.keys if k >= low][:n]
            return [(window[-1] if window else None,)]
        if "fn_cdc_get_max_lsn" in s:
            return [("00000030:000011f0:0004",)]
        raise AssertionError(f"unexpected SQL: {sql}")


def test_sqlserver_dialect_discovery_and_planning():
    from flink_cdc_2_3_0_src_spark.sources.sqlserver import SqlServerDialect

    keys = [1, 5, 9, 1000, 1004, 1009, 5000]
    cfg = SourceConfig(database_list=["dbo"], chunk_size=3)
    d = SqlServerDialect(cfg, SqlServerRunner(keys))
    tables = d.discover_tables()
    assert tables == [TableId("dbo", None, "orders")]
    t = tables[0]
    assert d.split_key(t) == "id"
    splits = d.planner(t).plan_splits()
    for k in keys:
        assert sum(1 for s in splits if s.range.contains(k)) == 1
    assert d.current_offset() == ("lsn", "00000030:000011f0:0004")
    # bracket quoting in emitted SQL
    assert any("[id]" in q_ for q_ in d.run_sql.log)


class Db2Runner:
    def __init__(self, keys):
        self.keys = sorted(keys)
        self.log = []

    def __call__(self, sql: str):
        self.log.append(sql)
        s = sql.lower()
        assert "limit" not in s, f"Db2 got a LIMIT clause: {sql}"
        if "syscat.tables" in s and "tabschema" in s and "card" not in s:
            return [("APP", "ORDERS")]
        if "keycoluse" in s:
            return [("ID",)]
        if "min(" in s:
            return [(self.keys[0], self.keys[-1])]
        if "card" in s:
            return [(-1,)]  # pre-RUNSTATS
        if "fetch first" in s and "order by" in s:
            low = int(sql.split(">=", 1)[1].split("ORDER")[0].strip())
            n = int(s.split("fetch first", 1)[1].split("rows")[0].strip())
            window = [k for k in self.keys if k >= low][:n]
            return [(window[-1] if window else None,)]
        if "ibmsnap_register" in s:
            return [("0000AA02",)]
        raise AssertionError(f"unexpected SQL: {sql}")


def test_db2_dialect_discovery_and_planning():
    from flink_cdc_2_3_0_src_spark.sources.db2 import Db2Dialect

    keys = [10, 20, 30, 40]
    cfg = SourceConfig(database_list=["APP"], chunk_size=2)
    d = Db2Dialect(cfg, Db2Runner(keys))
    tables = d.discover_tables()
    assert tables == [TableId("APP", None, "ORDERS")]
    t = tables[0]
    assert d.split_key(t) == "ID"
    # CARD = -1 before RUNSTATS must clamp, not go negative
    assert d.approx_row_count(t) == 0
    splits = d.planner(t).plan_splits()
    for k in keys:
        assert sum(1 for s in splits if s.range.contains(k)) == 1
    assert d.current_offset() == ("lsn", "0000AA02")


def test_oracle_redo_log_offset_ordering():
    """RedoLogOffset compareTo parity (RedoLogOffset.java:67-95):
    NO_STOPPING dominates, SCNs compare numerically (BigInteger-wide),
    absent SCN sorts below any present one; == is record-wide."""
    from flink_cdc_2_3_0_src_spark.sources.oracle import RedoLogOffset as R

    a, b = R.of_scn(100), R.of_scn(200)
    big = R.of_scn(10**30)  # past int64: Oracle Scn is unbounded
    ns = R.non_stopping()
    empty = R(None)
    assert a < b < big < ns
    assert ns >= ns and not (ns > ns)
    assert empty < a and a > empty
    assert not (empty < R(None)) and not (empty > R(None))
    # scn ties with different commit_scn: order-equal, not ==
    t1, t2 = R(100, commit_scn=5), R(100, commit_scn=9)
    assert not (t1 < t2) and not (t1 > t2) and t1 >= t2 and t1 <= t2
    assert t1 != t2
    assert R.initial() == R(0) and R.initial() < a
    assert sorted([ns, big, a, empty, b]) == [empty, a, b, big, ns]


def test_pg_lsn_parse_format_roundtrip():
    from flink_cdc_2_3_0_src_spark.sources.postgres import (
        format_pg_lsn,
        parse_pg_lsn,
    )

    assert parse_pg_lsn("16/B374D848") == (0x16 << 32) | 0xB374D848
    assert parse_pg_lsn("0/0") == 0
    assert format_pg_lsn(parse_pg_lsn("1A2B/00000010")) == "1A2B/10"
    # ordering is plain integer ordering across the word boundary
    assert parse_pg_lsn("1/0") > parse_pg_lsn("0/FFFFFFFF")
    import pytest

    with pytest.raises(ValueError, match="malformed"):
        parse_pg_lsn("nope")
    with pytest.raises(ValueError, match="out of range"):
        parse_pg_lsn("0/100000000")


def test_pg_lsn_high_word_validated():
    import pytest

    from flink_cdc_2_3_0_src_spark.sources.postgres import parse_pg_lsn

    with pytest.raises(ValueError, match="out of range"):
        parse_pg_lsn("FFFFFFFFF/0")  # 36-bit high word


def test_config_schema_and_tenant_options():
    """Per-dialect identity parts: schema-name (Postgres/Oracle/
    SqlServer/Db2, JdbcSourceOptions.java SCHEMA_NAME) and tenant-name
    (OceanBase, OceanBaseTableSourceFactory.java:57)."""
    c = SourceConfig.from_options(
        {"schema-name": "INVENTORY", "tenant-name": "sys"}
    )
    assert c.schema_name == "INVENTORY"
    assert c.tenant_name == "sys"
