"""Connected-components convergence guards: pointer doubling must reach
the fixpoint in O(log diameter) rounds — long chains (diameter > 2x the
old one-hop iteration cap) were silently mislabeled before."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from flink_cdc_2_3_0_src_spark.operators.dedup import connected_components


def _sym_edges(spark, pairs):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return df.unionByName(
        df.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()


def test_long_chain_converges_to_min_label(spark):
    # 120-node path graph: diameter 119 — one-hop propagation needs 119
    # rounds; pointer doubling needs ~7. max_iters=20 must suffice.
    n = 120
    edges = _sym_edges(spark, [(i, i + 1) for i in range(n - 1)])
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edges, max_iters=20).collect()
    }
    assert labels == {i: 0 for i in range(n)}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(42)
    nodes = list(range(200))
    pairs = [
        (rng.choice(nodes), rng.choice(nodes))
        for _ in range(150)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]

    # pure-Python union-find oracle
    parent = {i: i for i in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    in_graph = {a for a, _ in pairs} | {b for _, b in pairs}
    expect = {x: find(x) for x in in_graph}
    # canonicalize to component-min
    comp_min: dict[int, int] = {}
    for x, r in expect.items():
        comp_min[find(r)] = min(comp_min.get(find(r), x), x)
    expect = {x: comp_min[find(x)] for x in in_graph}

    edges = _sym_edges(spark, pairs)
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(edges, max_iters=20).collect()
    }
    assert labels == expect


def _corpus(spark):
    """Documents with exact dups, a near-dup pair, and distinct docs."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    near = "alpha beta gamma delta epsilon zeta eta theta iota lambda"
    rows = [
        (1, base), (2, base),            # exact duplicates
        (3, near),                        # near-dup of 1/2 (high Jaccard)
        (4, "one two three four five six seven eight nine ten"),
        (5, "completely different tokens here nothing shared at all ok"),
        (6, base),                        # third exact copy
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_lsh_jvm_path_properties(spark):
    """Production xxhash64 LSH path: exact dups always found, no false
    positives, and agreement with the oracle-parity pandas path on
    exact duplicates."""
    from flink_cdc_2_3_0_src_spark.operators.dedup import lsh_pairs, lsh_pairs_jvm

    docs = _corpus(spark)
    jvm = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in lsh_pairs_jvm(docs).collect()}
    # exact duplicates (J=1) collide in every band under ANY hash
    for pair in [(1, 2), (1, 6), (2, 6)]:
        assert pair in jvm and jvm[pair] == 1.0, (pair, jvm)
    # no false positives: every emitted pair really is >= threshold
    assert all(j >= 0.5 for j in jvm.values())
    # dissimilar docs never pair
    assert not any(4 in p or 5 in p for p in jvm)
    # parity path agrees on the exact-dup core
    par = {(r["doc_a"], r["doc_b"]) for r in lsh_pairs(docs).collect()}
    assert {(1, 2), (1, 6), (2, 6)} <= par


def test_lsh_jvm_path_has_no_python_in_plan(spark):
    from flink_cdc_2_3_0_src_spark.operators.dedup import lsh_pairs_jvm

    docs = _corpus(spark)
    plan = lsh_pairs_jvm(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # fully JVM: the 100 TB configuration


def test_fuzzy_blocked_complete_vs_bruteforce(spark):
    """Prefix-gram blocking must find EXACTLY the brute-force all-pairs
    result for docs above the completeness boundary (all testdata docs
    are >= 48 chars >= q*(d+1) = 18) — the scale twin loses no pairs."""
    import duckdb

    from flink_cdc_2_3_0_src_spark.io import load_table
    from flink_cdc_2_3_0_src_spark.operators.dedup import fuzzy_blocked_pairs

    sf = "/root/testdata/sf0.001"
    got = {
        (r["doc_a"], r["doc_b"], r["edit_dist"])
        for r in fuzzy_blocked_pairs(load_table(spark, sf, "documents")).collect()
    }
    brute = duckdb.sql(
        f"""
        WITH d AS (SELECT doc_id, text FROM '{sf}/documents.parquet')
        SELECT a.doc_id, b.doc_id, levenshtein(a.text, b.text) ed
        FROM d a JOIN d b ON a.doc_id < b.doc_id
        WHERE levenshtein(a.text, b.text) <= 5
        """
    ).fetchall()
    assert got == {(a, b, e) for a, b, e in brute}
    assert len(got) > 0  # non-vacuous: testdata contains near-dup pairs


def test_fuzzy_blocked_plan_has_no_cartesian(spark):
    from flink_cdc_2_3_0_src_spark.io import load_table
    from flink_cdc_2_3_0_src_spark.operators.dedup import fuzzy_blocked_pairs

    plan = (
        fuzzy_blocked_pairs(load_table(spark, "/root/testdata/sf0.001", "documents"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---- incremental near-dup dedup state (r8) ----


def test_incremental_dedup_equals_one_shot_any_split(spark):
    """Replaying the corpus in ascending doc_id batches through the
    bucket state reproduces the one-shot rejection rule (doc_b of any
    verified LSH pair) for every split — including whatever duplicate
    chains the fixture plants."""
    from flink_cdc_2_3_0_src_spark.io import load_table
    from flink_cdc_2_3_0_src_spark.operators.dedup import (
        incremental_dedup,
        lsh_pairs,
    )
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    rejected = lsh_pairs(docs).select(
        F.col("doc_b").alias("doc_id")
    ).distinct()
    want = sorted(
        r["doc_id"]
        for r in docs.join(rejected, "doc_id", "left_anti").collect()
    )
    assert 0 < len(want) < docs.count()  # the fixture plants near-dups
    for n in (1, 3):
        got = sorted(
            r["doc_id"]
            for r in incremental_dedup(docs, n_batches=n).collect()
        )
        assert got == want, f"n_batches={n}"


def test_merge_neardup_state_rejects_across_and_within_batches(spark):
    """An arrival identical to a SEEN doc is rejected by the state; an
    arrival identical to an EARLIER row of the same batch is rejected
    within-batch; null-text docs never collide and are kept."""
    from flink_cdc_2_3_0_src_spark.operators.dedup import (
        merge_neardup_state,
    )

    def docs(rows):
        return spark.createDataFrame(
            rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
        )

    t = "the quick brown fox jumps over the lazy dog again and again"
    state, kept1 = merge_neardup_state(
        None, docs([(1, t, "en", "s", 1), (2, "completely different words "
                                             "all over this text body", "en", "s", 1)])
    )
    assert sorted(r["doc_id"] for r in kept1.collect()) == [1, 2]

    state, kept2 = merge_neardup_state(
        state, docs([(3, t, "en", "s", 1),          # dup of seen doc 1
                     (4, None, "en", "s", 1),        # null text: kept
                     (5, "brand new content nothing like the others "
                         "in any way at all", "en", "s", 1),
                     (6, "brand new content nothing like the others "
                         "in any way at all", "en", "s", 1)])  # dup of 5, same batch
    )
    assert sorted(r["doc_id"] for r in kept2.collect()) == [4, 5]
