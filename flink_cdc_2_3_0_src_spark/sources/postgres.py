"""Postgres dialect (B15 cross-DB uniformity).

Reference parity: the Postgres connector is a Debezium wrapper with a
configurable changelog mode (PostgreSQLTableSource.java:106-116) and, in
our engine, shares the generic chunked-snapshot framework — only the SQL
surface differs. This subclass overrides exactly the dialect-owned
pieces (identifier quoting, catalog queries, offset probe), mirroring
the reference's JdbcDataSourceDialect SPI split.
"""

from __future__ import annotations

from flink_cdc_2_3_0_src_spark.model import ChangelogMode, TableId
from flink_cdc_2_3_0_src_spark.sources.jdbc import JdbcDialect


def pq(ident: str) -> str:
    """Postgres identifier quoting."""
    return '"' + ident.replace('"', '""') + '"'


class PostgresDialect(JdbcDialect):
    """Changelog mode is configurable ('all' | 'upsert') like the
    reference's `changelog-mode` option.

    Only the dialect-owned hooks are overridden (quoting, catalogs,
    row-count estimate, offset probe); the shared ANSI chunking SQL —
    analyze, next-chunk-max incl. composite keys, escaped literals —
    is inherited from JdbcDialect."""

    def __init__(self, config, run_sql, changelog_mode: ChangelogMode = ChangelogMode.ALL):
        super().__init__(config, run_sql)
        self.changelog_mode = changelog_mode

    def q(self, ident: str) -> str:
        return pq(ident)

    def discover_tables(self) -> list[TableId]:
        rows = self.run_sql(
            "SELECT schemaname, tablename FROM pg_catalog.pg_tables "
            "WHERE schemaname NOT IN ('pg_catalog', 'information_schema')"
        )
        from flink_cdc_2_3_0_src_spark.model import match_tables

        all_ids = [TableId(db, None, t) for db, t in rows]
        return match_tables(all_ids, self.config.database_list, self.config.table_list)

    def primary_key_columns(self, table: TableId) -> list[str]:
        from flink_cdc_2_3_0_src_spark.model import _sql_lit

        regclass = _sql_lit(f"{table.catalog}.{table.table}")
        rows = self.run_sql(
            "SELECT a.attname FROM pg_index i "
            "JOIN pg_attribute a ON a.attrelid = i.indrelid "
            "AND a.attnum = ANY(i.indkey) "
            f"WHERE i.indrelid = {regclass}::regclass "
            "AND i.indisprimary ORDER BY a.attnum"
        )
        return [r[0] for r in rows]

    def approx_row_count(self, table: TableId) -> int:
        from flink_cdc_2_3_0_src_spark.model import _sql_lit

        regclass = _sql_lit(f"{table.catalog}.{table.table}")
        rows = self.run_sql(
            "SELECT reltuples::BIGINT FROM pg_class "
            f"WHERE oid = {regclass}::regclass"
        )
        return int(rows[0][0]) if rows and rows[0][0] is not None else 0

    def current_offset(self):
        rows = self.run_sql("SELECT pg_current_wal_lsn()")
        return ("wal", rows[0][0])

    def jdbc_url(self) -> str:
        c = self.config
        return f"jdbc:postgresql://{c.hostname}:{c.port or 5432}/postgres"


# ---------------------------------------------------------------------------
# WAL LSN position (A22 for Postgres)
# ---------------------------------------------------------------------------
# The 2.3 reference consumes Postgres through the legacy Debezium source
# (PostgreSQLSource.java), whose offsets carry the WAL LSN as the
# Debezium long; the pg textual form is 'XXXXXXXX/YYYYYYYY' (two hex
# words: high 32 bits / low 32 bits).  These helpers give the planner
# the same comparable-position contract the other connectors' offsets
# have (BinlogOffset, ChangeStreamOffset, RedoLogOffset).


def parse_pg_lsn(lsn: str) -> int:
    """'16/B374D848' -> 64-bit WAL position (high<<32 | low)."""
    try:
        hi, lo = lsn.strip().split("/")
        hi_v, lo_v = int(hi, 16), int(lo, 16)
    except (ValueError, AttributeError) as e:
        raise ValueError(f"malformed pg LSN {lsn!r} (want 'X/Y' hex)") from e
    if not (0 <= hi_v <= 0xFFFFFFFF and 0 <= lo_v <= 0xFFFFFFFF):
        raise ValueError(f"pg LSN word out of range in {lsn!r}")
    return (hi_v << 32) | lo_v


def format_pg_lsn(value: int) -> str:
    """64-bit WAL position -> the canonical 'X/Y' textual form."""
    if value < 0:
        raise ValueError(f"negative LSN {value}")
    return f"{value >> 32:X}/{value & 0xFFFFFFFF:X}"
