"""B15: cross-DB uniformity — the same table yields the same chunk plan
through the MySQL and Postgres dialects (only the SQL surface differs)."""

from __future__ import annotations

from flink_cdc_2_3_0_src_spark.config import SourceConfig
from flink_cdc_2_3_0_src_spark.model import ChangelogMode, TableId
from flink_cdc_2_3_0_src_spark.sources.jdbc import JdbcDialect
from flink_cdc_2_3_0_src_spark.sources.postgres import PostgresDialect

KEYS = [1, 5, 9, 1000, 1001, 1002, 1003, 4000, 4001, 9999]


class FakeDb:
    """Answers both MySQL- and Postgres-flavored dialect SQL."""

    def __call__(self, sql):
        s = sql.lower()
        if "pg_tables" in s:
            return [("public", "orders")]
        if "information_schema.tables" in s and "table_type" in s:
            return [("public", "orders")]
        if "pg_index" in s or "key_column_usage" in s:
            return [("id",)]
        if "min(" in s:
            return [(KEYS[0], KEYS[-1])]
        if "reltuples" in s or "table_rows" in s:
            return [(len(KEYS),)]
        if "order by" in s and "limit" in s:
            low = int(s.split(">=")[1].split("order")[0].strip())
            limit = int(s.rsplit("limit", 1)[1].split(")")[0].strip())
            window = [k for k in KEYS if k >= low][:limit]
            return [(window[-1] if window else None,)]
        if "pg_current_wal_lsn" in s:
            return [("0/16B3748",)]
        if "show master status" in s:
            return [("mysql-bin.000001", 4)]
        raise AssertionError(f"unexpected SQL: {sql}")


def test_same_chunk_plan_across_dialects():
    cfg = SourceConfig(database_list=["public"], table_list=["public\\.orders"],
                       chunk_size=4)
    t = TableId("public", None, "orders")
    my = JdbcDialect(cfg, FakeDb())
    pg = PostgresDialect(cfg, FakeDb(), changelog_mode=ChangelogMode.UPSERT)
    assert my.discover_tables() == pg.discover_tables() == [t]
    my_plan = [(s.range.start, s.range.end) for s in my.planner(t).plan_splits()]
    pg_plan = [(s.range.start, s.range.end) for s in pg.planner(t).plan_splits()]
    assert my_plan == pg_plan  # identical plan, different SQL surface
    assert pg.changelog_mode == ChangelogMode.UPSERT
    # dialect-specific quoting in the predicates
    my_preds = [s.range.predicate_sql("`id`") for s in my.planner(t).plan_splits()]
    pg_preds = [s.range.predicate_sql('"id"') for s in pg.planner(t).plan_splits()]
    assert my_preds[0].startswith("`id`") and pg_preds[0].startswith('"id"')
    assert pg.current_offset() == ("wal", "0/16B3748")
