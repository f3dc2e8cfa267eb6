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
from flink_cdc_2_3_0_src_spark.model import TableId, _sql_lit, match_tables
from flink_cdc_2_3_0_src_spark.plans.chunking import ChunkPlanner, TableAnalysis

# SqlRunner: (sql) -> list[tuple] — executes on the source DB (driver side)
SqlRunner = Callable[[str], list[tuple]]


def q(ident: str) -> str:
    """MySQL identifier quoting."""
    return "`" + ident.replace("`", "``") + "`"


class JdbcDialect:
    """MySQL-flavored dialect; subclass for Postgres/Oracle/DuckDB
    (quoting, information_schema layout, offset SQL). Subclasses override
    only the dialect-owned hooks — ``q``/discovery/row-count/offset —
    mirroring the reference's JdbcDataSourceDialect SPI split; the
    chunking SQL shapes (analyze, next-chunk-max, split-scan predicates)
    are ANSI and shared."""

    def __init__(self, config: SourceConfig, run_sql: SqlRunner) -> None:
        self.config = config
        self.run_sql = run_sql

    def q(self, ident: str) -> str:
        """Identifier quoting (MySQL backticks by default)."""
        return "`" + ident.replace("`", "``") + "`"

    def fetch_first_sql(self, n: int) -> str:
        """Row-limit clause appended after ORDER BY. MySQL/Postgres/
        DuckDB use LIMIT; Oracle/Db2 use FETCH FIRST, SQL Server
        OFFSET-FETCH — dialect-owned because the chunking SQL is
        otherwise ANSI."""
        return f"LIMIT {n}"

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
            "WHERE constraint_name = 'PRIMARY' "
            f"AND table_schema = {_sql_lit(table.catalog)} "
            f"AND table_name = {_sql_lit(table.table)} ORDER BY ordinal_position"
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

    def split_keys(self, table: TableId):
        """Full split key: one column name, or the list of PK columns for
        composite (multi-column) primary keys (B10; reference handles the
        multi-column conjunction in StatementUtils.buildSplitScanQuery:132-188)."""
        if self.config.chunk_key_column:
            return self.config.chunk_key_column
        pks = self.primary_key_columns(table)
        if not pks:
            raise ValueError(
                f"table {table.dotted()} has no primary key; set "
                "scan.incremental.snapshot.chunk.key-column"
            )
        return pks[0] if len(pks) == 1 else pks

    def _tref(self, table: TableId) -> str:
        return f"{self.q(table.catalog)}.{self.q(table.table)}" if table.catalog else self.q(table.table)

    def _scan_source(self, table: TableId) -> str:
        """FROM-clause source for chunk scans: the table itself, or the
        configured snapshot.select.statement.overrides subquery for this
        table (Debezium's per-table snapshot statement override — e.g. a
        soft-delete filter or a pre-joined view).  The override is
        wrapped as a derived table so the chunk-range predicate and
        projection still apply ON TOP of it: chunking stays correct
        because the split key's min/max/next-chunk queries run against
        the SAME wrapped source.  (approx_row_count still reads the
        UNFILTERED information_schema estimate — with a selective
        override the distribution factor skews toward more/lazier
        chunks, which affects chunk sizing only, never coverage.)"""
        override = (self.config.snapshot_select_overrides or {}).get(
            table.dotted()
        )
        return f"({override}) SNAP_" if override else self._tref(table)

    def approx_row_count(self, table: TableId) -> int:
        """Dialect hook: approximate row count (A2; reference
        queryApproximateRowCnt:58-76 uses SHOW TABLE STATUS)."""
        cnt_rows = self.run_sql(
            "SELECT table_rows FROM information_schema.tables "
            f"WHERE table_schema = {_sql_lit(table.catalog)} "
            f"AND table_name = {_sql_lit(table.table)}"
        )
        return int(cnt_rows[0][0]) if cnt_rows and cnt_rows[0][0] is not None else 0

    def key_select_expr(self, key: str) -> str:
        """Expression used wherever a split-key VALUE is read back as a
        chunk boundary (A2 min/max, A4 next-chunk-max).  Dialect hook:
        Oracle wraps the ROWID pseudo-column in ROWIDTOCHAR so bounds
        come back as portable strings (OracleChunkSplitter.java:179-290)."""
        return self.q(key)

    # ---- A2: analyze ----
    def analyze(self, table: TableId, key) -> TableAnalysis:
        if not isinstance(key, str):
            return self._analyze_composite(table, list(key))
        tref = self._scan_source(table)
        kx = self.key_select_expr(key)
        mn, mx = self.run_sql(
            f"SELECT MIN({kx}), MAX({kx}) FROM {tref}"
        )[0]
        cnt = self.approx_row_count(table)
        numeric = isinstance(mn, (int, float)) and not isinstance(mn, bool)
        return TableAnalysis(mn, mx, cnt, numeric)

    def _analyze_composite(self, table: TableId, keys: list) -> TableAnalysis:
        """Composite-PK analyze: lexicographic extrema via ORDER BY LIMIT 1
        (MIN/MAX don't compose across columns); always non-numeric so the
        planner takes the lazy uneven path."""
        tref = self._scan_source(table)
        cols = ", ".join(self.q(k) for k in keys)
        asc = ", ".join(f"{self.q(k)} ASC" for k in keys)
        desc = ", ".join(f"{self.q(k)} DESC" for k in keys)
        mn_rows = self.run_sql(
            f"SELECT {cols} FROM {tref} ORDER BY {asc} {self.fetch_first_sql(1)}"
        )
        mx_rows = self.run_sql(
            f"SELECT {cols} FROM {tref} ORDER BY {desc} {self.fetch_first_sql(1)}"
        )
        cnt = self.approx_row_count(table)
        mn = tuple(mn_rows[0]) if mn_rows else None
        mx = tuple(mx_rows[0]) if mx_rows else None
        return TableAnalysis(mn, mx, cnt, numeric=False)

    # ---- A4: bounded next-chunk-max ----
    def query_next_chunk_max(self, table: TableId, key) -> Callable[[Any], Any]:
        if not isinstance(key, str):
            return self._query_next_chunk_max_composite(table, list(key))
        tref = self._scan_source(table)

        def _next(low: Any) -> Any:
            # data-derived boundary: MUST go through _sql_lit (escapes
            # quotes, hex-encodes bytes) — a raw f"'{low}'" breaks the
            # snapshot or injects SQL on keys containing a quote.
            # Reference uses prepared statements here
            # (StatementUtils.queryNextChunkMax:99-130).
            # WHERE / ORDER BY / MAX all use key_select_expr so the
            # whole chunk protocol lives in ONE ordering space — for
            # Oracle ROWID that's the ROWIDTOCHAR string space the
            # planner's Python comparisons use (raw-ROWID ordering
            # disagrees with the char form's collation, which would
            # make MAX() pick a non-boundary row).
            kx = self.key_select_expr(key)
            rows = self.run_sql(
                f"SELECT MAX(K_) FROM ("
                f"SELECT {kx} AS K_ FROM {tref} "
                f"WHERE {kx} >= {_sql_lit(low)} "
                f"ORDER BY {kx} ASC {self.fetch_first_sql(self.config.chunk_size)}) T"
            )
            return rows[0][0] if rows else None

        return _next

    def _query_next_chunk_max_composite(
        self, table: TableId, keys: list
    ) -> Callable[[Any], Any]:
        """Composite A4: bounded window ordered by all key columns; the
        window max is its lexicographically-last row (ORDER BY DESC LIMIT 1
        over the subquery, since SQL MAX() can't take a column tuple)."""
        from flink_cdc_2_3_0_src_spark.model import ChunkRange

        tref = self._scan_source(table)
        qkeys = [self.q(k) for k in keys]
        cols = ", ".join(qkeys)
        asc = ", ".join(f"{k} ASC" for k in qkeys)
        desc = ", ".join(f"{k} DESC" for k in qkeys)

        def _next(low: Any) -> Any:
            pred = ChunkRange(tuple(low), None).predicate_sql(qkeys)
            rows = self.run_sql(
                f"SELECT {cols} FROM ("
                f"SELECT {cols} FROM {tref} WHERE {pred} "
                f"ORDER BY {asc} {self.fetch_first_sql(self.config.chunk_size)}) T "
                f"ORDER BY {desc} {self.fetch_first_sql(1)}"
            )
            return tuple(rows[0]) if rows else None

        return _next

    # ---- A5: split-scan SQL (buildSplitScanQuery:132-188 parity) ----
    def columns_for_table(self, table: TableId) -> Optional[list[str]]:
        """Resolve column.include.list for ONE table.  Entries are
        either bare column names (apply to every captured table) or
        Debezium-style qualified ``db.table.column`` entries (apply to
        that table only).  Debezium semantics for qualified lists: a
        table with at least one matching entry captures only those
        columns (+ key); a table no entry references captures ALL its
        columns.  Returns None for 'all columns'."""
        inc = self.config.column_include_list
        if not inc:
            return None
        dotted = table.dotted()
        cols: list[str] = []
        qualified_seen = False
        for e in inc:
            if "." in e:
                qualified_seen = True
                prefix, _, col = e.rpartition(".")
                if prefix == dotted:
                    cols.append(col)
            else:
                cols.append(e)
        if not cols:
            # a qualified list that never references this table -> all
            # columns (Debezium's per-table filter semantics); an empty
            # list cannot otherwise occur (validate() rejects [])
            assert qualified_seen
            return None
        return list(dict.fromkeys(cols))  # bare + qualified may repeat

    def scan_select_list(self, table: TableId, split) -> str:
        """Projection for the chunk scan: ``*`` by default, or the
        configured column.include.list (Debezium column projection) with
        the split-key columns prepended when missing — the chunk
        protocol and the downstream upsert merge always need the key.
        At scale this is the difference between shipping a wide table's
        every column through every snapshot split and shipping only what
        the pipeline declared it needs."""
        include = self.columns_for_table(table)
        if not include:
            return "*"
        key = split.split_key
        key_cols = [key] if isinstance(key, str) else list(key)
        cols = [c for c in key_cols if c not in include] + list(include)
        return ", ".join(self.q(c) for c in cols)

    def split_scan_sql(self, table: TableId, split) -> str:
        """Chunk-range scan statement each snapshot split runs on the
        source DB: projected select list + the chunk's range predicate.
        Single-key predicates use key_select_expr so bounds captured in
        that space (e.g. Oracle ROWIDTOCHAR) compare consistently."""
        key = split.split_key
        qkey = (
            self.key_select_expr(key)
            if isinstance(key, str)
            else [self.q(k) for k in key]
        )
        sel = self.scan_select_list(table, split)
        return (
            f"SELECT {sel} FROM {self._scan_source(table)} "
            f"WHERE {split.range.predicate_sql(qkey)}"
        )

    def planner(self, table: TableId) -> ChunkPlanner:
        key = self.split_keys(table)
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
        key = key or self.split_keys(table)
        qkey = (
            self.key_select_expr(key)
            if isinstance(key, str)
            else [self.q(k) for k in key]
        )
        predicates = [
            s.range.predicate_sql(qkey) for s in self.planner(table).plan_splits()
        ]
        c = self.config
        return spark.read.jdbc(
            url=self.jdbc_url(),
            table=f"{self.q(table.catalog)}.{self.q(table.table)}",
            predicates=predicates,
            properties={
                "user": c.username,
                "password": c.password,
                "fetchsize": str(c.fetch_size),
                "connectTimeout": str(c.connect_timeout_sec * 1000),
            },
        )
