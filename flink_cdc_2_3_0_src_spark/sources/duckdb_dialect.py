"""DuckDB dialect: the engine's discovery→analyze→chunk→scan path driven
against a REAL database (B15 cross-DB uniformity; stands in for the
reference's container-DB integration tests, MySqlConnectorITCase.java:165-198,
since this environment has no containers).

Everything chunking-related is inherited from JdbcDialect — only the
dialect-owned hooks differ (ANSI double-quote identifiers, DuckDB
catalog functions, no replication log). ``run_sql`` is a live DuckDB
connection's execute/fetchall, so every generated statement is parsed
and executed by a real SQL engine — including escaped string-literal
boundaries and composite-key row-comparison expansions.
"""

from __future__ import annotations

from typing import Sequence

from flink_cdc_2_3_0_src_spark.model import TableId, _sql_lit, match_tables
from flink_cdc_2_3_0_src_spark.sources.jdbc import JdbcDialect


def duckdb_runner(con):
    """Adapt a duckdb connection to the SqlRunner seam."""

    def run(sql: str):
        return con.execute(sql).fetchall()

    return run


class DuckDbDialect(JdbcDialect):
    def q(self, ident: str) -> str:
        return '"' + ident.replace('"', '""') + '"'

    def discover_tables(self) -> list[TableId]:
        rows = self.run_sql(
            "SELECT table_schema, table_name FROM information_schema.tables "
            "WHERE table_type = 'BASE TABLE'"
        )
        all_ids = [TableId(db, None, t) for db, t in rows]
        return match_tables(all_ids, self.config.database_list, self.config.table_list)

    def primary_key_columns(self, table: TableId) -> list[str]:
        rows = self.run_sql(
            "SELECT unnest(constraint_column_names) FROM duckdb_constraints() "
            f"WHERE schema_name = {_sql_lit(table.catalog)} "
            f"AND table_name = {_sql_lit(table.table)} "
            "AND constraint_type = 'PRIMARY KEY'"
        )
        return [r[0] for r in rows]

    def approx_row_count(self, table: TableId) -> int:
        rows = self.run_sql(
            "SELECT estimated_size FROM duckdb_tables() "
            f"WHERE schema_name = {_sql_lit(table.catalog)} "
            f"AND table_name = {_sql_lit(table.table)}"
        )
        return int(rows[0][0]) if rows and rows[0][0] is not None else 0

    def current_offset(self):
        # DuckDB has no replication log; snapshot-only dialect.
        return ("duckdb", 0)

    def scan_split_rows(self, table: TableId, split) -> list[tuple]:
        """Run one snapshot split's scan statement on the live DB (A5)."""
        return self.run_sql(self.split_scan_sql(table, split))

    def snapshot_rows(self, table: TableId) -> list[tuple]:
        """Full chunked snapshot via the live DB: plan splits, scan each."""
        out: list[tuple] = []
        for s in self.planner(table).plan_splits():
            out.extend(self.scan_split_rows(table, s))
        return out
