"""Oracle dialect (reference flink-connector-oracle-cdc).

Incremental-framework connector in the reference (OracleChunkSplitter.java);
here it overrides only the dialect-owned hooks of the shared chunked-
snapshot framework: double-quote identifiers, ALL_TABLES/ALL_CONSTRAINTS
catalogs, FETCH FIRST row limiting, SCN offsets, and the A28 ROWID
fallback — tables without a primary key chunk on the ROWID pseudo-column
with opaque (lexicographic) ordering, taking the lazy uneven path
exactly like OracleChunkSplitter.java:115-290 (ROWID compare :268-271).
"""

from __future__ import annotations

from flink_cdc_2_3_0_src_spark.model import TableId, _sql_lit, match_tables
from flink_cdc_2_3_0_src_spark.sources.jdbc import JdbcDialect

_SYSTEM_OWNERS = (
    "'SYS'", "'SYSTEM'", "'OUTLN'", "'XDB'", "'CTXSYS'", "'MDSYS'",
    "'DBSNMP'", "'APPQOSSYS'", "'ORDSYS'",
)


class OracleDialect(JdbcDialect):
    def q(self, ident: str) -> str:
        # ROWID is a pseudo-column: a quoted "ROWID" makes Oracle look
        # for a physical column of that name (ORA-00904).  The reference
        # special-cases it too (OracleChunkSplitter.java:179-290) —
        # emit it unquoted everywhere it appears as the split key.
        if ident.upper() == "ROWID":
            return "ROWID"
        return '"' + ident.replace('"', '""') + '"'

    def key_select_expr(self, key: str) -> str:
        # Chunk BOUNDS for ROWID splits come back through ROWIDTOCHAR so
        # the planner holds portable 18-char strings; range predicates
        # then compare ROWID >= '<char-form>' (implicit CHARTOROWID).
        if key.upper() == "ROWID":
            return "ROWIDTOCHAR(ROWID)"
        return self.q(key)

    def fetch_first_sql(self, n: int) -> str:
        return f"FETCH FIRST {n} ROWS ONLY"

    # ---- A1: discovery from ALL_TABLES ----
    def discover_tables(self) -> list[TableId]:
        rows = self.run_sql(
            "SELECT owner, table_name FROM all_tables "
            f"WHERE owner NOT IN ({', '.join(_SYSTEM_OWNERS)})"
        )
        all_ids = [TableId(db, None, t) for db, t in rows]
        return match_tables(
            all_ids, self.config.database_list, self.config.table_list
        )

    def primary_key_columns(self, table: TableId) -> list[str]:
        rows = self.run_sql(
            "SELECT cols.column_name FROM all_constraints cons "
            "JOIN all_cons_columns cols "
            "ON cons.constraint_name = cols.constraint_name "
            "AND cons.owner = cols.owner "
            "WHERE cons.constraint_type = 'P' "
            f"AND cons.owner = {_sql_lit(table.catalog)} "
            f"AND cols.table_name = {_sql_lit(table.table)} "
            "ORDER BY cols.position"
        )
        return [r[0] for r in rows]

    def split_keys(self, table: TableId):
        """A28: no-PK tables chunk on ROWID (opaque string ordering →
        lazy uneven path) instead of raising."""
        if self.config.chunk_key_column:
            return self.config.chunk_key_column
        pks = self.primary_key_columns(table)
        if not pks:
            return "ROWID"
        return pks[0] if len(pks) == 1 else pks

    def split_key(self, table: TableId) -> str:
        keys = self.split_keys(table)
        return keys if isinstance(keys, str) else keys[0]

    def approx_row_count(self, table: TableId) -> int:
        rows = self.run_sql(
            "SELECT num_rows FROM all_tables "
            f"WHERE owner = {_sql_lit(table.catalog)} "
            f"AND table_name = {_sql_lit(table.table)}"
        )
        return int(rows[0][0]) if rows and rows[0][0] is not None else 0

    def current_offset(self):
        """Redo-log position = current SCN (reference RedoLogOffset)."""
        rows = self.run_sql("SELECT CURRENT_SCN FROM V$DATABASE")
        return ("scn", int(rows[0][0]))

    def jdbc_url(self) -> str:
        c = self.config
        return f"jdbc:oracle:thin:@//{c.hostname}:{c.port or 1521}/ORCLCDB"


# ---------------------------------------------------------------------------
# Redo-log offset (A22 for Oracle; reference RedoLogOffset.java)
# ---------------------------------------------------------------------------

from dataclasses import dataclass as _dataclass
from typing import Optional as _Optional


@_dataclass(frozen=True)
class RedoLogOffset:
    """Comparable Oracle redo-log position
    (flink-connector-oracle-cdc .../meta/offset/RedoLogOffset.java).

    ``scn`` is the system change number (unbounded — Oracle's Scn is a
    BigInteger; Python int).  ``commit_scn``/``lcr_position`` ride along
    exactly like the reference's offset map; ordering uses the SCN only
    (compareTo :67-95), with the NO_STOPPING sentinel greater than
    everything and an absent SCN less than any present one.  ``==``
    compares the whole record (reference equals() compares the map) —
    order comparisons are written out explicitly for the same reason as
    the Mongo offset: a derived ``>`` from scn-only ``<`` plus
    record-wide ``==`` would be inconsistent."""

    scn: _Optional[int]
    commit_scn: int = 0
    lcr_position: _Optional[str] = None
    no_stopping: bool = False

    @staticmethod
    def initial() -> "RedoLogOffset":
        return RedoLogOffset(0)

    @staticmethod
    def of_scn(scn: int, commit_scn: int = 0) -> "RedoLogOffset":
        return RedoLogOffset(int(scn), int(commit_scn))

    @staticmethod
    def non_stopping() -> "RedoLogOffset":
        return RedoLogOffset(None, no_stopping=True)

    def _cmp(self, other: "RedoLogOffset") -> int:
        if self.no_stopping and other.no_stopping:
            return 0
        if self.no_stopping:
            return 1
        if other.no_stopping:
            return -1
        if other.scn is not None:
            if self.scn is not None:
                return (self.scn > other.scn) - (self.scn < other.scn)
            return -1
        if self.scn is not None:
            return 1
        return 0

    def __lt__(self, other: "RedoLogOffset") -> bool:
        return self._cmp(other) < 0

    def __le__(self, other: "RedoLogOffset") -> bool:
        return self._cmp(other) <= 0

    def __gt__(self, other: "RedoLogOffset") -> bool:
        return self._cmp(other) > 0

    def __ge__(self, other: "RedoLogOffset") -> bool:
        return self._cmp(other) >= 0
