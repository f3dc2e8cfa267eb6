"""Chunk planner math (mirrors reference MySqlChunkSplitterTest)."""

from __future__ import annotations

from flink_cdc_2_3_0_src_spark.model import BinlogOffset, ChunkRange, TableId, match_tables
from flink_cdc_2_3_0_src_spark.plans.chunking import (
    ChunkPlanner,
    TableAnalysis,
    calculate_distribution_factor,
    split_evenly_sized_chunks,
)


def test_distribution_factor():
    # dense keys: factor == 1
    assert calculate_distribution_factor(1, 1000, 1000) == 1.0
    # sparse: factor > 1
    assert calculate_distribution_factor(0, 9999, 100) == 100.0
    assert calculate_distribution_factor(0, 0, 0) == float("inf")


def test_even_chunks_dense():
    chunks = split_evenly_sized_chunks(1, 100, 100, 25, 1.0)
    # (-inf,26) [26,51) [51,76) [76,+inf)
    assert chunks[0] == ChunkRange(None, 26)
    assert chunks[-1].end is None
    assert len(chunks) == 4
    # ranges tile without gaps
    for a, b in zip(chunks, chunks[1:]):
        assert a.end == b.start


def test_even_chunks_single():
    assert split_evenly_sized_chunks(1, 10, 10, 100, 1.0) == [ChunkRange(None, None)]


def test_even_chunks_sparse_factor():
    # factor 10 → dynamic chunk size 10*10=100 over [0,1000)
    chunks = split_evenly_sized_chunks(0, 999, 100, 10, 10.0)
    assert chunks[0] == ChunkRange(None, 100)
    assert all(
        c.end - c.start == 100 for c in chunks if c.start is not None and c.end is not None
    )


def test_uneven_lazy_planner():
    # simulate a sorted key column with gaps via the A4 callback
    keys = sorted(set([1, 2, 3, 50, 51, 52, 53, 900, 901, 902, 903, 904, 1000]))

    def analyze():
        return TableAnalysis(keys[0], keys[-1], len(keys), numeric=True)

    def next_max(low):
        window = [k for k in keys if k >= low][:5]
        return window[-1] if window else None

    p = ChunkPlanner(
        TableId(None, None, "t"),
        "k",
        analyze,
        next_max,
        chunk_size=5,
        dist_factor_lower=0.9,  # force uneven path (factor = 1000/13 ≈ 77 > upper)
        dist_factor_upper=2.0,
    )
    chunks = list(p.plan())
    assert chunks[0].start is None and chunks[-1].end is None
    # every key lands in exactly one chunk
    for k in keys:
        assert sum(1 for c in chunks if c.contains(k)) == 1


def test_chunk_contains_and_predicate():
    c = ChunkRange(10, 20)
    assert c.contains(10) and c.contains(19)
    assert not c.contains(20) and not c.contains(9)
    assert c.predicate_sql("k") == "k >= 10 AND k < 20"
    assert ChunkRange(None, 5).predicate_sql("k") == "k < 5"
    assert ChunkRange(5, None).predicate_sql("k") == "k >= 5"
    assert ChunkRange(None, None).predicate_sql("k") == "1=1"
    s = ChunkRange("a'b", None)
    assert s.predicate_sql("k") == "k >= 'a''b'"


def test_composite_chunk_predicate_and_contains():
    c = ChunkRange((1, 5), (3, 2))
    # lexicographic membership: (1,5) in, (3,2) out, (2,anything) in
    assert c.contains((1, 5)) and c.contains((2, 0)) and c.contains((3, 1))
    assert not c.contains((3, 2)) and not c.contains((1, 4)) and not c.contains((4, 0))
    sql = c.predicate_sql(["a", "b"])
    assert sql == (
        "((a > 1) OR (a = 1 AND b >= 5)) AND ((a < 3) OR (a = 3 AND b < 2))"
    )
    # unbounded sides
    assert ChunkRange(None, (3, 2)).predicate_sql(["a", "b"]) == (
        "((a < 3) OR (a = 3 AND b < 2))"
    )
    assert ChunkRange(None, None).predicate_sql(["a", "b"]) == "1=1"
    # string components are escaped
    s = ChunkRange(("O'Brien", 1), None).predicate_sql(["a", "b"])
    assert "'O''Brien'" in s


def test_composite_uneven_lazy_planner():
    # composite keys: tuples compare lexicographically in the planner loop
    keys = sorted({(o, l) for o in (1, 2, 7, 9) for l in (1, 2, 3)})

    def analyze():
        return TableAnalysis(keys[0], keys[-1], len(keys), numeric=False)

    def next_max(low):
        window = [k for k in keys if k >= tuple(low)][:4]
        return window[-1] if window else None

    p = ChunkPlanner(
        TableId(None, None, "t"), ["o", "l"], analyze, next_max, chunk_size=4
    )
    chunks = list(p.plan())
    assert chunks[0].start is None and chunks[-1].end is None
    for k in keys:
        assert sum(1 for c in chunks if c.contains(k)) == 1


def test_offset_total_order():
    a = BinlogOffset("mysql-bin.000001", 100)
    b = BinlogOffset("mysql-bin.000001", 200)
    c = BinlogOffset("mysql-bin.000002", 50)
    assert a < b < c
    assert BinlogOffset.earliest() < a < BinlogOffset.latest()
    g1 = BinlogOffset("f", 0, gtids="uuid1:1-10")
    g2 = BinlogOffset("f", 0, gtids="uuid1:1-20")
    assert g1 < g2 and not (g2 < g1)
    rt = BinlogOffset.from_json(g2.to_json())
    assert rt == g2


def test_table_regex_capture():
    tids = [TableId("db1", None, "users"), TableId("db1", None, "orders"),
            TableId("db2", None, "users")]
    got = match_tables(tids, ["db1"], ["db1\\.u.*"])
    assert got == [TableId("db1", None, "users")]
    got = match_tables(tids, ["db."], ["users"])
    assert len(got) == 2


def test_date_split_key_chunking(spark):
    """B10 over a DATE split key: typed DATE range literals, lazy uneven
    planning over a non-unique temporal key, exact union."""
    import datetime

    from flink_cdc_2_3_0_src_spark.model import ChunkRange
    from flink_cdc_2_3_0_src_spark.sources.parquet_dialect import ParquetTableSource
    from tests.conftest import SF_SMOKE

    pred = ChunkRange(
        datetime.date(1995, 3, 15), datetime.date(1996, 1, 1)
    ).predicate_sql("o_orderdate")
    assert pred == "o_orderdate >= DATE '1995-03-15' AND o_orderdate < DATE '1996-01-01'"

    src = ParquetTableSource(
        spark, SF_SMOKE, "orders", split_key="o_orderdate", chunk_size=300
    )
    splits = src.planner().plan_splits()
    assert len(splits) > 1  # genuinely chunked
    total = src.raw().count()
    assert src.chunked_scan(splits).count() == total


def test_parquet_source_surfaces_schema_and_tenant_metadata(spark):
    """Source-level wiring of the per-dialect identity parts: a source
    configured with schema-name/tenant-name exposes _schema/_tenant on
    its metadata scan (OracleReadableMetaData schema_name,
    OceanBaseReadableMetadata tenant_name)."""
    from flink_cdc_2_3_0_src_spark.model import SCHEMA_COL, TENANT_COL
    from flink_cdc_2_3_0_src_spark.sources.parquet_dialect import (
        ParquetTableSource,
    )
    from tests.conftest import SF_SMOKE

    src = ParquetTableSource(
        spark, SF_SMOKE, "region",
        schema_name="INVENTORY", tenant_name="sys",
    )
    out = src.scan(with_metadata=True)
    r = out.limit(1).collect()[0]
    assert r[SCHEMA_COL] == "INVENTORY" and r[TENANT_COL] == "sys"
    assert src.table_id.schema == "INVENTORY"
