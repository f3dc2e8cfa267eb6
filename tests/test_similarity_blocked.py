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


# --- neardup_cosine_lsh: planted-pair completeness + soundness (r5) ---
#
# LSH is not recall-complete in general, so (unlike fuzzy_blocked) a
# blanket equality-to-brute-force would be wrong.  The guarantees that
# CAN be pinned, mirroring the reference's golden-changelog method
# (MySqlConnectorITCase.java:259-271):
#   completeness on planted near-identical pairs — a vector and a tiny
#     perturbation of it sit on the same side of every hyperplane (no
#     hyperplane dot is near zero by construction), so the pair MUST
#     share a bucket and MUST be emitted;
#   soundness — every emitted pair is confirmed by an independent
#     brute-force all-pairs pass (same bucket AND cos6 >= tau).


def _planted_embeddings(spark, n_base=40, dim=16):
    import numpy as np

    rng = np.random.RandomState(20260814)
    base = rng.randn(n_base, dim)
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v], "lab"))
        # planted near-dup: 1% relative nudge -> cos ~ 0.9999
        nudge = v * (1.0 + 0.01 * rng.randn(dim) * 0.1) + 0.001 * rng.randn(dim)
        rows.append((1000 + i, [float(x) for x in nudge], "lab"))
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label string"
    )


def test_neardup_cosine_lsh_planted_pairs_found(spark):
    from flink_cdc_2_3_0_src_spark.operators.similarity import (
        _bucket_udf,
        neardup_cosine_lsh,
    )
    from pyspark.sql import functions as F

    dim = 16
    emb = _planted_embeddings(spark, dim=dim)
    got = {
        (r["vec_a"], r["vec_b"]): r["cos6"]
        for r in neardup_cosine_lsh(emb, dim=dim, threshold=0.9).collect()
    }
    # completeness: every planted (i, 1000+i) pair found with cos >= 0.9
    for i in range(40):
        assert (i, 1000 + i) in got, f"planted pair {i} missed by LSH"
        assert got[(i, 1000 + i)] >= 0.9
    assert len(got) >= 40


def test_neardup_cosine_lsh_sound_vs_brute_force(spark):
    """Every LSH-emitted pair must appear in an independent brute-force
    all-pairs pass restricted to shared buckets — and the LSH result
    must equal that restriction EXACTLY (it is the blocked brute force,
    so any difference is a candidate-generation bug)."""
    import itertools

    import numpy as np

    from flink_cdc_2_3_0_src_spark.operators.similarity import (
        hyperplanes,
        neardup_cosine_lsh,
    )

    dim = 16
    tau = 0.3
    emb = _planted_embeddings(spark, dim=dim)
    got = {
        (r["vec_a"], r["vec_b"]): r["cos6"]
        for r in neardup_cosine_lsh(emb, dim=dim, threshold=tau).collect()
    }

    rows = emb.collect()
    planes = np.array(hyperplanes(dim)).T
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64) for r in rows}
    bucket = {
        vid: int(
            sum(
                (1 << j)
                for j in range(planes.shape[1])
                if np.round(v @ planes[:, j], 6) >= 0
            )
        )
        for vid, v in vecs.items()
    }
    expect = {}
    for a, b in itertools.combinations(sorted(vecs), 2):
        if bucket[a] != bucket[b]:
            continue
        va, vb = vecs[a], vecs[b]
        c = round(float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))), 6)
        if c >= tau:
            expect[(a, b)] = c
    assert got == expect


def test_ivf_trained_plan_and_recall(spark):
    """Trained-IVF sanity: plan has no cartesian product (the candidate
    path is an equi-join on cell id), and every returned neighbor is a
    true member of a probed cell with correctly-ordered exact distances."""
    from flink_cdc_2_3_0_src_spark.io import load_table
    from flink_cdc_2_3_0_src_spark.operators.clustering import (
        ann_topk_ivf_trained,
    )
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    out = ann_topk_ivf_trained(emb)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    rows = out.collect()
    assert len(rows) > 0
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["rnk"], r["dist2"]))
    for q, lst in by_q.items():
        lst.sort()
        dists = [d for _, d in lst]
        assert dists == sorted(dists), f"query {q}: non-monotone ranking"


def test_merge_knn_state_equals_one_shot_any_split(spark):
    """Incremental exact k-NN graph maintenance (the similarity member
    of the maintenance family): replaying the corpus in ascending
    vec_id batches — per-batch work O(batch x seen), never a corpus
    rescan — yields BIT-exactly the one-shot knn_graph, for every
    split.  Correctness rests on bounded top-k being a monoid:
    top_k(S u B) = top_k(top_k(S) u top_k(B))."""
    from pyspark.sql import functions as F

    from flink_cdc_2_3_0_src_spark.operators.similarity import (
        merge_knn_state,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings").limit(120)
    want = _edges(knn_graph(emb, k=3, block_size=37))
    assert len(want) > 0
    hi = emb.agg(F.max("vec_id")).collect()[0][0]
    for nb in (1, 3):
        state = None
        for i in range(nb):
            lo = i * (int(hi) + 1) // nb
            up = (i + 1) * (int(hi) + 1) // nb
            cond = (F.col("vec_id") >= lo) & (F.col("vec_id") < up)
            if i == nb - 1:
                cond = F.col("vec_id") >= lo if nb > 1 else F.lit(True)
            state = merge_knn_state(state, emb.filter(cond), k=3,
                                    block_size=37)
            state = (
                state[0].localCheckpoint(eager=True),
                state[1].localCheckpoint(eager=True),
            )
        assert _edges(state[1]) == want, f"n_batches={nb}"
