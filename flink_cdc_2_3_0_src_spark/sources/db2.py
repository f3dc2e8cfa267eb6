"""Db2 dialect (reference flink-connector-db2-cdc).

Legacy Debezium wrapper in the reference (ASN capture tables); run here
through the shared chunked-snapshot framework with SYSCAT catalogs and
FETCH FIRST row limiting.
"""

from __future__ import annotations

from flink_cdc_2_3_0_src_spark.model import TableId, _sql_lit, match_tables
from flink_cdc_2_3_0_src_spark.sources.jdbc import JdbcDialect


class Db2Dialect(JdbcDialect):
    def q(self, ident: str) -> str:
        return '"' + ident.replace('"', '""') + '"'

    def fetch_first_sql(self, n: int) -> str:
        return f"FETCH FIRST {n} ROWS ONLY"

    def discover_tables(self) -> list[TableId]:
        rows = self.run_sql(
            "SELECT TRIM(tabschema), tabname FROM syscat.tables "
            "WHERE type = 'T' AND tabschema NOT LIKE 'SYS%'"
        )
        all_ids = [TableId(db, None, t) for db, t in rows]
        return match_tables(
            all_ids, self.config.database_list, self.config.table_list
        )

    def primary_key_columns(self, table: TableId) -> list[str]:
        rows = self.run_sql(
            "SELECT colname FROM syscat.keycoluse "
            f"WHERE tabschema = {_sql_lit(table.catalog)} "
            f"AND tabname = {_sql_lit(table.table)} ORDER BY colseq"
        )
        return [r[0] for r in rows]

    def approx_row_count(self, table: TableId) -> int:
        rows = self.run_sql(
            "SELECT card FROM syscat.tables "
            f"WHERE tabschema = {_sql_lit(table.catalog)} "
            f"AND tabname = {_sql_lit(table.table)}"
        )
        n = int(rows[0][0]) if rows and rows[0][0] is not None else 0
        return max(n, 0)  # CARD is -1 before RUNSTATS

    def current_offset(self):
        """ASN capture position: max commit sequence from the monitor
        table (hex bytes, lexicographic — Debezium's Lsn shape)."""
        rows = self.run_sql(
            "SELECT MAX(cd_new_synchpoint) FROM asncdc.ibmsnap_register"
        )
        return ("lsn", rows[0][0])

    def jdbc_url(self) -> str:
        c = self.config
        return f"jdbc:db2://{c.hostname}:{c.port or 50000}/testdb"
