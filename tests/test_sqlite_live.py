"""Second live engine for the dialect SQL (B15): the same
discovery→analyze→chunk→scan battery as test_duckdb_live.py, executed
by stdlib sqlite3 — an independent SQL parser that catches dialect
drift the scripted fakes (and any single engine) can't."""

from __future__ import annotations

import sqlite3

import pytest

from flink_cdc_2_3_0_src_spark.config import SourceConfig
from flink_cdc_2_3_0_src_spark.model import TableId
from flink_cdc_2_3_0_src_spark.sources.sqlite_dialect import (
    SqliteDialect,
    sqlite_runner,
)


@pytest.fixture()
def con():
    c = sqlite3.connect(":memory:")
    c.execute("CREATE TABLE orders_live (id INTEGER PRIMARY KEY, amount REAL)")
    c.executemany(
        "INSERT INTO orders_live VALUES (?, ?)",
        [(i, i * 1.5) for i in range(1, 1001)],
    )
    c.execute("CREATE TABLE customers_live (name TEXT PRIMARY KEY, city TEXT)")
    names = [
        "Adams", "Brown", "Chen", "Diaz", "Evans", "Fung", "Garcia",
        "Hahn", "Ito", "Jones", "Kim", "Lee", "Miller", "Ng",
        "O'Brien", "O'Connor", "O'Neil", "Patel", "Quinn", "Rossi",
        "Smith", "Tran", "Usman", "Vogel", "Wang", "Xu", "Yang", "Zhu",
    ]
    c.executemany("INSERT INTO customers_live VALUES (?, 'x')", [(n,) for n in names])
    c.execute(
        "CREATE TABLE line_live (order_id INTEGER, line_no INTEGER, qty INTEGER, "
        "PRIMARY KEY (order_id, line_no))"
    )
    c.executemany(
        "INSERT INTO line_live VALUES (?, ?, ?)",
        [(o, l, o * 10 + l) for o in range(1, 121) for l in range(1, 5)],
    )
    yield c
    c.close()


def _dialect(con, chunk_size=64, **cfg) -> SqliteDialect:
    return SqliteDialect(SourceConfig(chunk_size=chunk_size, **cfg), sqlite_runner(con))


def test_sqlite_live_discovery_regex(con):
    d = _dialect(con, table_list=[r"main\.(orders|customers)_live"])
    tables = {t.table for t in d.discover_tables()}
    assert tables == {"orders_live", "customers_live"}


def test_sqlite_live_numeric_pk_snapshot_roundtrip(con):
    d = _dialect(con, chunk_size=100)
    t = TableId("main", None, "orders_live")
    assert d.split_keys(t) == "id"
    a = d.analyze(t, "id")
    assert (a.min_key, a.max_key) == (1, 1000) and a.numeric
    splits = d.planner(t).plan_splits()
    assert len(splits) > 1
    rows = d.snapshot_rows(t)
    assert sorted(r[0] for r in rows) == list(range(1, 1001))
    for probe in (1, 500, 1000):
        assert sum(1 for s in splits if s.range.contains(probe)) == 1


def test_sqlite_live_string_pk_with_quotes(con):
    d = _dialect(con, chunk_size=5)
    t = TableId("main", None, "customers_live")
    assert d.split_keys(t) == "name"
    splits = d.planner(t).plan_splits()
    assert len(splits) > 1
    rows = d.snapshot_rows(t)
    got = sorted(r[0] for r in rows)
    expect = sorted(
        r[0] for r in con.execute("SELECT name FROM customers_live").fetchall()
    )
    assert got == expect  # O'Brien etc. survive chunk-boundary literals


def test_sqlite_live_composite_pk_snapshot_roundtrip(con):
    d = _dialect(con, chunk_size=37)
    t = TableId("main", None, "line_live")
    assert d.split_keys(t) == ["order_id", "line_no"]
    a = d.analyze(t, ["order_id", "line_no"])
    assert a.min_key == (1, 1) and a.max_key == (120, 4) and not a.numeric
    splits = d.planner(t).plan_splits()
    assert len(splits) > 1
    rows = d.snapshot_rows(t)
    got = sorted((r[0], r[1]) for r in rows)
    expect = sorted(
        (o, l)
        for o, l in con.execute("SELECT order_id, line_no FROM line_live").fetchall()
    )
    assert got == expect
    for probe in [(1, 1), (60, 3), (120, 4)]:
        assert sum(1 for s in splits if s.range.contains(probe)) == 1
