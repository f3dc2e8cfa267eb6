"""Heavy-tail scale guard (r5 VERDICT item 5).

The two most expensive pipeline operators — blocked fuzzy dedup and
duplicated-span detection — are sub-quadratic ONLY if their intermediate
candidate volumes track planted-duplicate density rather than the square
of the corpus size.  The synthetic generator keeps dup density fixed
across scale factors, so a 10x corpus (sf0.01 -> sf0.1 documents:
500 -> 5000 docs) must grow candidates ~10x; a quadratic shape would
grow them ~100x.  These tests pin that property on the exposed
candidate-stage seams so a future blocking regression (e.g. a gram
bucket blow-up) fails loudly instead of silently re-quadratifying the
heavy tail.  (Exactly that happened through r5: the prefix q-gram
filter's candidates grew 2.3k -> 224k across this corpus pair — ~n² —
which motivated the Pass-Join segment blocking now under guard.)
"""

from __future__ import annotations

from flink_cdc_2_3_0_src_spark.io import load_table as ld
from flink_cdc_2_3_0_src_spark.operators.dedup import fuzzy_blocked_candidates
from flink_cdc_2_3_0_src_spark.operators.text import duplicated_span_hits

SF_SMALL = "/root/testdata/sf0.01"   # 500 docs
SF_LARGE = "/root/testdata/sf0.1"    # 5000 docs
CORPUS_RATIO = 10


def test_fuzzy_candidates_track_density_not_corpus_squared(spark):
    small = fuzzy_blocked_candidates(ld(spark, SF_SMALL, "documents")).count()
    large = fuzzy_blocked_candidates(ld(spark, SF_LARGE, "documents")).count()
    assert small > 0  # planted dups exist — the guard is non-vacuous
    # linear-in-corpus at fixed density, with 3x headroom for density
    # fluctuation between generator runs; quadratic would be ~100x
    assert large <= 3 * CORPUS_RATIO * small, (small, large)
    assert large >= small  # grows with the corpus at all


def test_span_hits_track_density_not_corpus_squared(spark):
    small = duplicated_span_hits(ld(spark, SF_SMALL, "documents")).count()
    large = duplicated_span_hits(ld(spark, SF_LARGE, "documents")).count()
    assert small > 0
    assert large <= 3 * CORPUS_RATIO * small, (small, large)
    assert large >= small


def test_passjoin_blocking_completeness_randomized(spark):
    """Pigeonhole completeness of the segment blocking: for 60 planted
    pairs (random base string, <= d random single-char edits — inserts,
    deletes, substitutions at random positions), fuzzy_blocked_pairs
    must report every pair with the exact edit distance bound.  One
    Spark job for all pairs; fixed seed for reproducibility."""
    import random

    from flink_cdc_2_3_0_src_spark.operators.dedup import fuzzy_blocked_pairs

    rng = random.Random(0xC0FFEE)
    alpha = "abcdefghij "
    rows = []
    expected = set()
    for p in range(60):
        n = rng.randint(20, 120)
        base = "".join(rng.choice(alpha) for _ in range(n))
        d = rng.randint(0, 5)
        s = list(base)
        for _ in range(d):
            op = rng.choice("ids")
            if op == "i":
                s.insert(rng.randint(0, len(s)), rng.choice(alpha))
            elif op == "d" and len(s) > 8:
                s.pop(rng.randrange(len(s)))
            else:
                s[rng.randrange(len(s))] = rng.choice(alpha)
        a_id, b_id = 2 * p, 2 * p + 1
        rows.append((a_id, base))
        rows.append((b_id, "".join(s)))
        expected.add((a_id, b_id))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"])
        for r in fuzzy_blocked_pairs(docs, max_dist=5).collect()
    }
    # every planted pair must be found (candidates may legitimately
    # include cross-pair coincidences; completeness is the guarantee)
    missing = expected - got
    assert not missing, f"planted pairs missed by blocking: {sorted(missing)[:5]}"
