"""Blocked exact-KNN: the multi-block path must agree with the
single-block path (and therefore with the DuckDB oracle, which the
oracle-parity sweep checks separately)."""

from __future__ import annotations

from flink_cdc_2_3_0_src_spark.io import load_table
from flink_cdc_2_3_0_src_spark.operators.similarity import knn_graph
from tests.conftest import SF_SMOKE


def _edges(df):
    return {
        (r["vec_id"], r["rnk"]): (r["neighbor_id"], r["cos6"])
        for r in df.collect()
    }


def test_knn_graph_blocked_matches_single_block(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    single = _edges(knn_graph(emb, k=3, block_size=1_000_000))
    # force real block pairing: several blocks, none covering the corpus
    blocked = _edges(knn_graph(emb, k=3, block_size=37))
    assert blocked == single


def test_knn_graph_has_no_driver_collect_of_corpus(spark):
    """Plan-shape guard: knn_graph builds its result lazily (cogrouped
    FlatMapCoGroupsInPandas), so constructing the DataFrame must not
    trigger any Spark job that pulls embedding vectors to the driver."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    df = knn_graph(emb, k=3, block_size=64)
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "FlatMapCoGroupsInPandas" in plan
