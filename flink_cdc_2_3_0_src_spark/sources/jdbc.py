"""Chunked-parallel JDBC snapshot source (A1-A5 against a real database).

This is the production dialect path: the same ChunkPlanner drives a
``spark.read.jdbc(url, table, predicates=[...])`` where every chunk
range becomes one WHERE predicate → one Spark partition → one executor
task with its own pooled connection. Matches the reference's design:

  - discovery: information_schema queries + regex include lists (A1,
    TableDiscoveryUtils.java)
  - analyze:  SELECT MIN(k), MAX(k); approximate row count from
    information_schema.tables (A2, StatementUtils.queryMinMax:38-56,
    queryApproximateRowCnt:58-76)
  - uneven chunking: SELECT MAX(k) FROM (SELECT k FROM t WHERE k >= ?
    ORDER BY k LIMIT chunk_size) T (A4, queryNextChunkMax:99-130)
  - chunk scan: range WHERE + fetchsize streaming cursor (A5,
    buildSplitScanQuery:132-188; fetch size default 1024)

No database is available in this environment, so this module is
exercised by unit tests through an injected SQL runner (the same seam
the dialect SPI gives the reference, JdbcDataSourceDialect).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from flink_cdc_2_3_0_src_spark.config import SourceConfig
from flink_cdc_2_3_0_src_spark.model import TableId, match_tables
from flink_cdc_2_3_0_src_spark.plans.chunking import ChunkPlanner, TableAnalysis

# SqlRunner: (sql) -> list[tuple] — executes on the source DB (driver side)
SqlRunner = Callable[[str], list[tuple]]


def q(ident: str) -> str:
    """MySQL identifier quoting."""
    return "`" + ident.replace("`", "``") + "`"


class JdbcDialect:
    """MySQL-flavored dialect; subclass for Postgres/Oracle (quoting,
    information_schema layout, offset SQL)."""

    def __init__(self, config: SourceConfig, run_sql: SqlRunner) -> None:
        self.config = config
        self.run_sql = run_sql

    # ---- A1: discovery ----
    def discover_tables(self) -> list[TableId]:
        rows = self.run_sql(
            "SELECT table_schema, table_name FROM information_schema.tables "
            "WHERE table_type = 'BASE TABLE'"
        )
        all_ids = [TableId(db, None, t) for db, t in rows]
        return match_tables(
            all_ids, self.config.database_list, self.config.table_list
        )

    def primary_key_columns(self, table: TableId) -> list[str]:
        rows = self.run_sql(
            "SELECT column_name FROM information_schema.key_column_usage "
            f"WHERE constraint_name = 'PRIMARY' AND table_schema = '{table.catalog}' "
            f"AND table_name = '{table.table}' ORDER BY ordinal_position"
        )
        return [r[0] for r in rows]

    def split_key(self, table: TableId) -> str:
        if self.config.chunk_key_column:
            return self.config.chunk_key_column
        pks = self.primary_key_columns(table)
        if not pks:
            # A33: parallel snapshot requires a PK (or explicit chunk key)
            raise ValueError(
                f"table {table.dotted()} has no primary key; set "
                "scan.incremental.snapshot.chunk.key-column"
            )
        return pks[0]

    # ---- A2: analyze ----
    def analyze(self, table: TableId, key: str) -> TableAnalysis:
        tref = f"{q(table.catalog)}.{q(table.table)}" if table.catalog else q(table.table)
        mn, mx = self.run_sql(
            f"SELECT MIN({q(key)}), MAX({q(key)}) FROM {tref}"
        )[0]
        cnt_rows = self.run_sql(
            "SELECT table_rows FROM information_schema.tables "
            f"WHERE table_schema = '{table.catalog}' AND table_name = '{table.table}'"
        )
        cnt = int(cnt_rows[0][0]) if cnt_rows and cnt_rows[0][0] is not None else 0
        numeric = isinstance(mn, (int, float)) and not isinstance(mn, bool)
        return TableAnalysis(mn, mx, cnt, numeric)

    # ---- A4: bounded next-chunk-max ----
    def query_next_chunk_max(self, table: TableId, key: str) -> Callable[[Any], Any]:
        tref = f"{q(table.catalog)}.{q(table.table)}" if table.catalog else q(table.table)

        def _next(low: Any) -> Any:
            lit = f"'{low}'" if isinstance(low, str) else str(low)
            rows = self.run_sql(
                f"SELECT MAX({q(key)}) FROM ("
                f"SELECT {q(key)} FROM {tref} WHERE {q(key)} >= {lit} "
                f"ORDER BY {q(key)} ASC LIMIT {self.config.chunk_size}) T"
            )
            return rows[0][0] if rows else None

        return _next

    def planner(self, table: TableId) -> ChunkPlanner:
        key = self.split_key(table)
        return ChunkPlanner(
            table_id=table,
            split_key=key,
            analyze=lambda: self.analyze(table, key),
            query_next_chunk_max=self.query_next_chunk_max(table, key),
            chunk_size=self.config.chunk_size,
            dist_factor_lower=self.config.dist_factor_lower,
            dist_factor_upper=self.config.dist_factor_upper,
            throttle=True,
        )

    # ---- current log offset ("SHOW MASTER STATUS") for watermarking ----
    def current_offset(self) -> tuple[str, int]:
        rows = self.run_sql("SHOW MASTER STATUS")
        return (rows[0][0], int(rows[0][1]))

    # ---- A5: the parallel chunked read ----
    def jdbc_url(self) -> str:
        c = self.config
        return (
            f"jdbc:mysql://{c.hostname}:{c.port or 3306}/"
            f"?useSSL=false&serverTimezone={c.server_time_zone}"
        )

    def chunked_read(
        self, spark: SparkSession, table: TableId, key: Optional[str] = None
    ) -> DataFrame:
        """One Spark partition per chunk via the ``predicates`` API;
        fetchsize keeps each partition a streaming cursor."""
        key = key or self.split_key(table)
        predicates = [
            s.range.predicate_sql(q(key)) for s in self.planner(table).plan_splits()
        ]
        c = self.config
        return spark.read.jdbc(
            url=self.jdbc_url(),
            table=f"{q(table.catalog)}.{q(table.table)}",
            predicates=predicates,
            properties={
                "user": c.username,
                "password": c.password,
                "fetchsize": str(c.fetch_size),
                "connectTimeout": str(c.connect_timeout_sec * 1000),
            },
        )
