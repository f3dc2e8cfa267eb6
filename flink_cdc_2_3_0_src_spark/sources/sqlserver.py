"""SQL Server dialect (reference flink-connector-sqlserver-cdc).

Legacy Debezium wrapper in the reference; our engine runs it through the
shared chunked-snapshot framework (strictly better semantics per SURVEY
§3.3), overriding only the dialect-owned hooks: bracket identifiers,
sys.* catalogs, OFFSET-FETCH row limiting, and CDC max-LSN offsets.
"""

from __future__ import annotations

from flink_cdc_2_3_0_src_spark.model import TableId, _sql_lit, match_tables
from flink_cdc_2_3_0_src_spark.sources.jdbc import JdbcDialect


class SqlServerDialect(JdbcDialect):
    def q(self, ident: str) -> str:
        return "[" + ident.replace("]", "]]") + "]"

    def fetch_first_sql(self, n: int) -> str:
        # OFFSET-FETCH requires ORDER BY — always present in our
        # chunking SQL (the only place a row limit is emitted)
        return f"OFFSET 0 ROWS FETCH NEXT {n} ROWS ONLY"

    # ---- A1: discovery from sys.tables ----
    def discover_tables(self) -> list[TableId]:
        rows = self.run_sql(
            "SELECT s.name, t.name FROM sys.tables t "
            "JOIN sys.schemas s ON t.schema_id = s.schema_id "
            "WHERE t.is_ms_shipped = 0"
        )
        all_ids = [TableId(db, None, t) for db, t in rows]
        return match_tables(
            all_ids, self.config.database_list, self.config.table_list
        )

    def primary_key_columns(self, table: TableId) -> list[str]:
        rows = self.run_sql(
            "SELECT c.name FROM sys.indexes i "
            "JOIN sys.index_columns ic ON i.object_id = ic.object_id "
            "AND i.index_id = ic.index_id "
            "JOIN sys.columns c ON ic.object_id = c.object_id "
            "AND ic.column_id = c.column_id "
            "WHERE i.is_primary_key = 1 "
            f"AND i.object_id = OBJECT_ID({_sql_lit(table.dotted())}) "
            "ORDER BY ic.key_ordinal"
        )
        return [r[0] for r in rows]

    def approx_row_count(self, table: TableId) -> int:
        rows = self.run_sql(
            "SELECT SUM(row_count) FROM sys.dm_db_partition_stats "
            f"WHERE object_id = OBJECT_ID({_sql_lit(table.dotted())}) "
            "AND index_id IN (0, 1)"
        )
        return int(rows[0][0]) if rows and rows[0][0] is not None else 0

    def current_offset(self):
        """CDC capture position = max LSN (hex string, lexicographically
        ordered — the reference's LsnOffset compares the same way)."""
        rows = self.run_sql("SELECT sys.fn_cdc_get_max_lsn()")
        return ("lsn", rows[0][0])

    def jdbc_url(self) -> str:
        c = self.config
        return (
            f"jdbc:sqlserver://{c.hostname}:{c.port or 1433};"
            "encrypt=false"
        )
