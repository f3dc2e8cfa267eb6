"""SQLite dialect: a SECOND live engine for the discovery→analyze→
chunk→scan path (B15 cross-DB uniformity).

DuckDB (tests/test_duckdb_live.py) already executes every generated
statement on one real engine; SQLite's parser is an independent
implementation with different quoting/limit/catalog corners, so dialect
SQL that merely *happens* to parse on DuckDB — or that only the
scripted fakes ever saw — fails loudly here too.  Stands in, with
DuckDB, for the reference's container-DB ITCases
(MySqlConnectorITCase.java:165-198).

Only the dialect-owned hooks differ; ALL chunking SQL (A2 min/max, A4
bounded next-chunk-max with the K_ bound alias, A5 range predicates,
composite-key lexicographic expansion, string-literal escaping) is the
shared JdbcDialect code.
"""

from __future__ import annotations

from flink_cdc_2_3_0_src_spark.model import TableId, _sql_lit, match_tables
from flink_cdc_2_3_0_src_spark.sources.jdbc import JdbcDialect


def sqlite_runner(con):
    """Adapt a stdlib sqlite3 connection to the SqlRunner seam."""

    def run(sql: str):
        return con.execute(sql).fetchall()

    return run


class SqliteDialect(JdbcDialect):
    def q(self, ident: str) -> str:
        return '"' + ident.replace('"', '""') + '"'

    def discover_tables(self) -> list[TableId]:
        rows = self.run_sql(
            "SELECT 'main', name FROM sqlite_master "
            "WHERE type = 'table' AND name NOT LIKE 'sqlite_%'"
        )
        all_ids = [TableId(db, None, t) for db, t in rows]
        return match_tables(all_ids, self.config.database_list, self.config.table_list)

    def primary_key_columns(self, table: TableId) -> list[str]:
        # pragma_table_info's pk column is the 1-based PK ordinal
        rows = self.run_sql(
            "SELECT name FROM pragma_table_info("
            f"{_sql_lit(table.table)}) WHERE pk > 0 ORDER BY pk"
        )
        return [r[0] for r in rows]

    def approx_row_count(self, table: TableId) -> int:
        rows = self.run_sql(f"SELECT COUNT(*) FROM {self._tref(table)}")
        return int(rows[0][0]) if rows else 0

    def _tref(self, table: TableId) -> str:
        # sqlite has no schema qualifier for the main database
        return self.q(table.table)

    def current_offset(self):
        # no replication log; snapshot-only dialect
        return ("sqlite", 0)

    def scan_split_rows(self, table: TableId, split) -> list[tuple]:
        """Run one snapshot split's scan statement on the live DB (A5)."""
        return self.run_sql(self.split_scan_sql(table, split))

    def snapshot_rows(self, table: TableId) -> list[tuple]:
        """Full chunked snapshot via the live DB: plan splits, scan each."""
        out: list[tuple] = []
        for s in self.planner(table).plan_splits():
            out.extend(self.scan_split_rows(table, s))
        return out
