"""Unit tests for the round-4 pipeline operators: PII redaction
(operators/text.py), Gopher rule-set filtering, and weighted data
mixing (operators/mixing.py) — behavior-level checks beyond the oracle
parity sweep."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_cdc_2_3_0_src_spark.operators import mixing as M
from flink_cdc_2_3_0_src_spark.operators import text as X


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )


def test_pii_redact_masks_every_class(spark):
    df = _docs(
        spark,
        [
            (1, "mail me at a.b-c@sub.example.org or x@y.io thanks", "en", "src0", 1),
            (2, "call 555-123-4567 and 555-000-1111", "en", "src0", 1),
            (3, "server 192.168.0.1 and 10.0.0.255 up", "en", "src1", 1),
            (4, "clean text no pii at all", "en", "src1", 1),
        ],
    )
    red = df.select(X.pii_redact(F.col("text")).alias("r")).collect()
    texts = [r["r"] for r in red]
    assert texts[0] == "mail me at <EMAIL> or <EMAIL> thanks"
    assert texts[1] == "call <PHONE> and <PHONE>"
    assert texts[2] == "server <IP> and <IP> up"
    assert texts[3] == "clean text no pii at all"
    # idempotence: nothing PII-shaped survives a redaction pass
    for _, pat, _ in X.PII_CLASSES:
        leftover = df.select(
            F.sum(F.regexp_count(X.pii_redact(F.col("text")), F.lit(pat))).alias("n")
        ).collect()[0]["n"]
        assert leftover == 0


def test_pii_stats_counts(spark):
    df = _docs(
        spark,
        [
            (1, "a@b.co and c@d.org plus 555-123-4567", "en", "s1", 1),
            (2, "no pii here", "en", "s1", 1),
            (3, "1.2.3.4", "en", "s2", 1),
        ],
    )
    rows = {r["source"]: r for r in X.pii_stats(df).collect()}
    assert rows["s1"]["n_emails"] == 2
    assert rows["s1"]["n_phones"] == 1
    assert rows["s1"]["n_ips"] == 0
    assert rows["s1"]["n_docs_with_pii"] == 1
    assert rows["s2"]["n_ips"] == 1
    assert rows["s2"]["n_docs_with_pii"] == 1


def test_gopher_flags_rule_by_rule(spark):
    ok = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [
        (1, ok, "en", "s", 1),  # passes everything
        (2, "too short", "en", "s", 1),  # fails f_ntok (2 < 5)
        (3, "the word " + "x" * 40 + " is far too long to keep here", "en", "s", 1),
        (4, "dup dup dup dup dup dup dup dup dup the", "en", "s", 1),  # 90% rep
        (5, "vive une grande phrase sans marqueurs typiques ici present", "fr", "s", 1),
    ]
    df = _docs(spark, rows)
    flags = X.gopher_flags(F.col("text"))
    got = df.select("doc_id", *[c.alias(k) for k, c in flags.items()]).collect()
    by_id = {r["doc_id"]: r for r in got}
    assert all(by_id[1][k] for k in flags)
    assert not by_id[2]["f_ntok"]
    assert not by_id[3]["f_maxwl"]
    assert not by_id[4]["f_rep"]
    # doc 5 has no English stopword markers -> fails f_stop
    assert not by_id[5]["f_stop"]


def test_gopher_filter_retention(spark):
    df = _docs(
        spark,
        [
            (1, "the cat and the dog ran over a hill", "en", "s1", 1),
            (2, "na", "en", "s1", 1),
        ],
    )
    row = X.gopher_quality_filter(df).collect()[0]
    assert row["n_docs"] == 2 and row["n_pass"] == 1
    assert abs(row["retention"] - 0.5) < 1e-9


def test_mix_weighted_sample_invariants(spark):
    from flink_cdc_2_3_0_src_spark.io import load_table

    from tests.conftest import SF_SMOKE
    docs = load_table(spark, SF_SMOKE, "documents")
    out = M.mix_weighted_sample(docs).collect()
    assert len(out) > 0
    for r in out:
        assert 0 <= r["keep_ppm"] <= 1_000_000
        assert 0 <= r["n_kept"] <= r["n_docs"]
        assert 0 <= r["kept_tokens"] <= r["tok_s"]
        assert 1 <= r["weight"] <= 4
    # a source whose allocation exceeds its size keeps everything
    for r in out:
        if r["keep_ppm"] == 1_000_000:
            assert r["n_kept"] == r["n_docs"]
    # determinism: the hash-based selection is identical across runs
    again = M.mix_weighted_sample(docs).collect()
    key = lambda r: r["source"]  # noqa: E731
    assert sorted(out, key=key) == sorted(again, key=key)


def test_mix_budget_respected(spark):
    """Total selected tokens stay within ~budget + one source's worth of
    rounding slack (rates are floored, so the sample can only undershoot
    per source; clamped sources can push the total above the naive
    budget only when the budget exceeds the corpus)."""
    from flink_cdc_2_3_0_src_spark.io import load_table

    from tests.conftest import SF_SMOKE
    docs = load_table(spark, SF_SMOKE, "documents")
    out = M.mix_weighted_sample(docs, budget_num=1, budget_den=2).collect()
    total = sum(r["tok_s"] for r in out)
    kept = sum(r["kept_tokens"] for r in out)
    assert kept <= total
    # unclamped sources should sample strictly below their full size
    unclamped = [r for r in out if r["keep_ppm"] < 1_000_000]
    for r in unclamped:
        assert r["kept_tokens"] < r["tok_s"]


# --- k-means clustering (operators/clustering.py) ---


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_kmeans_recovers_separated_groups(spark):
    from flink_cdc_2_3_0_src_spark.operators import clustering as C

    near_a = [(i, [1.0 + 0.01 * i, 1.0, 0.0, 0.0]) for i in range(0, 4)]
    near_b = [(i, [-1.0, -1.0 - 0.01 * i, 0.0, 0.0]) for i in range(4, 8)]
    # ids laid out so init centroid 0 sits in group A and centroid 1 in
    # group B; two Lloyd's rounds must keep the groups separated
    df = _emb(spark, [(0, near_a[0][1]), (1, near_b[0][1])]
              + [(i + 2, v) for i, (_, v) in enumerate(near_a[1:] + near_b[1:])])
    out = C.kmeans_clusters(df, k=2, iters=2).collect()
    by_cl = {r["cluster"]: r for r in out}
    assert len(by_cl) == 2
    assert by_cl[0]["n_vecs"] == 4 and by_cl[1]["n_vecs"] == 4
    # group A = ids {0, 2, 3, 4}, group B = ids {1, 5, 6, 7}
    assert by_cl[0]["sum_vec_id"] == 0 + 2 + 3 + 4
    assert by_cl[1]["sum_vec_id"] == 1 + 5 + 6 + 7


def test_kmeans_partition_invariant(spark):
    from flink_cdc_2_3_0_src_spark.io import load_table
    from flink_cdc_2_3_0_src_spark.operators import clustering as C

    from tests.conftest import SF_SMOKE
    emb = load_table(spark, SF_SMOKE, "embeddings")
    a = sorted(C.kmeans_clusters(emb).collect())
    b = sorted(C.kmeans_clusters(emb.repartition(7)).collect())
    assert a == b
    total = emb.count()
    assert sum(r["n_vecs"] for r in a) == total


def test_mix_explicit_weights_map(spark):
    from flink_cdc_2_3_0_src_spark.io import load_table

    from tests.conftest import SF_SMOKE
    docs = load_table(spark, SF_SMOKE, "documents")
    srcs = sorted(r["source"] for r in docs.select("source").distinct().collect())
    heavy, zero = srcs[0], srcs[1]
    out = {
        r["source"]: r
        for r in M.mix_weighted_sample(
            docs, weights={heavy: 10, zero: 0}
        ).collect()
    }
    assert out[heavy]["weight"] == 10
    assert out[zero]["weight"] == 0
    # weight 0 -> nothing sampled from that source
    assert out[zero]["keep_ppm"] == 0 and out[zero]["n_kept"] == 0
    # unlisted sources default to weight 1
    others = [s for s in srcs if s not in (heavy, zero)]
    assert all(out[s]["weight"] == 1 for s in others)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        M.mix_weighted_sample(docs, weights={heavy: -1}).collect()


def test_kmv_similarity_estimator(spark):
    """KMV estimator sanity: identical sources -> 1.0, disjoint -> 0.0;
    when distinct shingles < k the sketch is the full set and the
    estimate is EXACT Jaccard."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "one two three four five six seven eight nine ten"
    rows = [
        (1, base, "en", "sA", 1),
        (2, base, "en", "sB", 1),      # sB identical to sA
        (3, other, "en", "sC", 1),     # sC disjoint from both
    ]
    df = _docs(spark, rows)
    out = {
        (r["source_a"], r["source_b"]): r
        for r in X.source_kmv_similarity(df).collect()
    }
    assert len(out) == 3
    ab = out[("sA", "sB")]
    # identical shingle sets, fewer than k distinct shingles -> exact 1.0
    # in n_common terms: every common hash is inside union_k, and
    # |union| = |sketch| < k, so est = |set|/k (documented k-normalized
    # estimate; equality of sketches is the signal)
    assert ab["n_common"] == len(base.split()) - 2  # distinct 3-gram count
    assert out[("sA", "sC")]["n_common"] == 0
    assert out[("sB", "sC")]["n_common"] == 0
    assert out[("sA", "sC")]["est_jaccard"] == 0.0


# ---------------------------------------------------------------------------
# dedup_spans (exact duplicated-span detection)
# ---------------------------------------------------------------------------
def test_duplicated_spans_island_merge(spark):
    """Two docs sharing a 10-token run (k=8 -> 3 overlapping duplicated
    windows each) produce ONE merged span per doc covering tokens 0..10;
    a doc with no shared window produces no row."""
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    df = _docs(
        spark,
        [
            (1, shared + " unique1 tail1 one", "en", "src0", 1),
            (2, shared + " unique2 tail2 two", "en", "src1", 1),
            (3, "totally different words that repeat nowhere at all ok", "en", "src2", 1),
        ],
    )
    out = X.duplicated_spans(df, k=8).orderBy("doc_id").collect()
    assert [(r["doc_id"], r["span_start"], r["span_end"], r["n_windows"]) for r in out] == [
        (1, 0, 10, 3),
        (2, 0, 10, 3),
    ]


def test_duplicated_spans_hashed_key_equals_string_key(spark):
    """The production path (xxhash64 8-byte shuffle key) returns exactly
    the oracle-checked string-keyed result on the real corpus."""
    from flink_cdc_2_3_0_src_spark.io import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    key = ["doc_id", "span_start", "span_end", "n_windows"]
    a = sorted(map(tuple, X.duplicated_spans(docs, hashed=False).select(key).collect()))
    b = sorted(map(tuple, X.duplicated_spans(docs, hashed=True).select(key).collect()))
    assert a == b and len(a) > 0


def test_duplicated_spans_respects_min_docs(spark):
    """A window repeated WITHIN one document only is not a duplicate
    across the corpus (min_docs=2 counts distinct documents)."""
    run = "one two three four five six seven eight"
    df = _docs(spark, [(1, run + " filler " + run, "en", "src0", 1)])
    assert X.duplicated_spans(df, k=8).count() == 0


# --- SemDeDup (operators/clustering.py semantic_dedup) ---


def test_semantic_dedup_prunes_exact_duplicates(spark):
    """Identical vectors land in the same cluster at cosine 1.0: every
    copy except the lowest id is pruned, attributed to that lowest id."""
    from flink_cdc_2_3_0_src_spark.operators import clustering as C

    a = [1.0, 0.5, 0.0, 0.0]
    b = [-1.0, 0.0, 0.5, 0.0]
    df = _emb(
        spark,
        [(0, a), (1, b), (2, a), (3, a), (4, b), (5, [0.0, 0.0, 0.0, 1.0])],
    )
    out = sorted(
        (r["pruned_vec_id"], r["kept_by"])
        for r in C.semantic_dedup(df, k=2, iters=2, tau_e3=999).collect()
    )
    assert out == [(2, 0), (3, 0), (4, 1)]


def test_semantic_dedup_threshold_monotone(spark):
    """Lowering tau can only grow the prune list (supset), and no pruned
    vector ever cites itself or a higher id as its keeper."""
    from flink_cdc_2_3_0_src_spark.io import load_table
    from flink_cdc_2_3_0_src_spark.operators import clustering as C
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    hi = {tuple(r) for r in C.semantic_dedup(emb, tau_e3=450).collect()}
    lo = {tuple(r) for r in C.semantic_dedup(emb, tau_e3=350).collect()}
    assert {(c, p) for c, p, _ in hi} <= {(c, p) for c, p, _ in lo}
    for _, pruned, kept in lo:
        assert kept < pruned


# --- Bloom-filter runtime semi-join (operators/bloom.py) ---


def test_bloom_never_false_negative(spark):
    """Every true match survives the pre-filter, and the filtered fact
    keeps its full row schema."""
    from flink_cdc_2_3_0_src_spark.operators import bloom as B

    fact = spark.createDataFrame(
        [(i, f"p{i}") for i in range(500)], "fk bigint, payload string"
    )
    dim = spark.createDataFrame(
        [(i,) for i in range(0, 500, 7)], "dk bigint"
    )
    out = B.bloom_prefilter(fact, "fk", dim, "dk")
    assert out.columns == ["fk", "payload"]
    kept = {r["fk"] for r in out.collect()}
    assert set(range(0, 500, 7)) <= kept  # no false negatives
    stats = B.bloom_semi_join_stats(fact, "fk", dim, "dk").collect()[0]
    assert stats["n_true_match"] == len(range(0, 500, 7))
    assert stats["n_bloom_pass"] == len(kept)
    assert stats["n_false_pos"] == stats["n_bloom_pass"] - stats["n_true_match"]


def test_bloom_probe_plan_has_no_join_on_fact_side(spark):
    """The probe must be a scan-level filter: the pre-filtered fact
    plan contains no join and no exchange at all."""
    from flink_cdc_2_3_0_src_spark.operators import bloom as B

    fact = spark.range(1000).withColumnRenamed("id", "fk")
    dim = spark.range(100).withColumnRenamed("id", "dk")
    plan = B.bloom_prefilter(fact, "fk", dim, "dk")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Exchange" not in plan


def test_bloom_handles_negative_keys(spark):
    """pmod keeps bit positions in range for negative keys; matches are
    still exact."""
    from flink_cdc_2_3_0_src_spark.operators import bloom as B

    fact = spark.createDataFrame(
        [(i,) for i in range(-250, 250)], "fk bigint"
    )
    dim = spark.createDataFrame([(i,) for i in range(-250, 250, 11)], "dk bigint")
    stats = B.bloom_semi_join_stats(fact, "fk", dim, "dk").collect()[0]
    assert stats["n_true_match"] == len(range(-250, 250, 11))
    assert stats["n_bloom_pass"] >= stats["n_true_match"]


# --- Z-order layout (operators/layout.py) ---


def test_zorder_interleave_hand_case(spark):
    """Morton code of 2-bit values: z(x=0b10, y=0b01) with x in slot 0 ->
    bits x0,y0,x1,y1 = 0,1,1,0 -> 0b0110 = 6."""
    from flink_cdc_2_3_0_src_spark.operators.layout import zorder_value

    df = spark.createDataFrame([(2, 1)], "x bigint, y bigint")
    z = df.select(
        zorder_value([F.col("x"), F.col("y")], bits=2).alias("z")
    ).collect()[0]["z"]
    assert z == 6


def test_zorder_buckets_shrink_envelopes(spark):
    """The point of z-order: per-bucket min/max envelopes cover far less
    of each dimension than the full span, in BOTH dimensions at once."""
    from flink_cdc_2_3_0_src_spark.io import load_table
    from flink_cdc_2_3_0_src_spark.operators.layout import zorder_layout_stats
    from tests.conftest import SF_SMOKE

    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.to_date(F.lit("1970-01-01")))
        .cast("bigint")
        .alias("o_days"),
    )
    rows = zorder_layout_stats(o, ["o_custkey", "o_days"]).collect()
    assert sum(r["n"] for r in rows) == o.count()
    full_ck = max(r["max_o_custkey"] for r in rows) - min(
        r["min_o_custkey"] for r in rows
    )
    full_d = max(r["max_o_days"] for r in rows) - min(r["min_o_days"] for r in rows)
    # average envelope fraction per bucket, per dimension
    frac_ck = sum(
        (r["max_o_custkey"] - r["min_o_custkey"]) / full_ck for r in rows
    ) / len(rows)
    frac_d = sum((r["max_o_days"] - r["min_o_days"]) / full_d for r in rows) / len(rows)
    # 16 z-range buckets over 2 dims -> each dimension's envelope should
    # average well under the full span (a 1-D sort would give ~1.0 on
    # the second dimension)
    assert frac_ck < 0.6 and frac_d < 0.6


# --- Count-Min sketch (operators/sketch.py) ---


def test_cms_never_undercounts_and_collides_when_narrow(spark):
    """CMS property: estimate >= exact always; with a tiny width,
    collisions produce strictly positive overestimates somewhere."""
    from flink_cdc_2_3_0_src_spark.operators.sketch import cms_heavy_hitters

    rng_words = [f"w{i}" for i in range(40)]
    docs = _docs(
        spark,
        [(i, " ".join(rng_words[(i * 7 + j) % 40] for j in range(15)), "en", "s", 1)
         for i in range(30)],
    )
    out = cms_heavy_hitters(docs, top_k=40, width=4).collect()
    assert all(r["overestimate"] >= 0 for r in out)
    assert all(r["cms_n"] == r["exact_n"] + r["overestimate"] for r in out)
    assert any(r["overestimate"] > 0 for r in out)  # width 4 must collide


# --- BPE vocabulary induction (operators/text.py bpe_train) ---


def test_bpe_train_hand_case(spark):
    """Known corpus: 'aaab' x3 + 'ab'.  Round 1: pairs a-a (count 2*3=6),
    a-b (4) -> merge (a,a).  Non-overlap fold: 'aaab' -> [aa, a, b]
    (the merged 'aa' cannot immediately re-merge).  Round 2 candidates:
    aa-a (3), a-b (3+1=4) -> merge (a,b)."""
    docs = _docs(
        spark,
        [(1, "aaab aaab", "en", "s", 1), (2, "aaab ab", "en", "s", 1)],
    )
    out = [
        (r["merge_rank"], r["sym_a"], r["sym_b"], r["pair_count"])
        for r in X.bpe_train(docs, rounds=2).orderBy("merge_rank").collect()
    ]
    assert out == [(1, "a", "a", 6), (2, "a", "b", 4)]


def test_bpe_apply_nonoverlap_fold(spark):
    """[b,b,b,b] under merge (b,b) -> [bb, bb], never [bb, b, b] or
    overlapping [bb, bb, bb]."""
    df = spark.createDataFrame([(["b", "b", "b", "b"],)], "syms array<string>")
    got = df.select(X._bpe_apply(F.col("syms"), "b", "b").alias("m")).collect()[0]["m"]
    assert got == ["bb", "bb"]


def test_classifier_xxhash_production_path(spark):
    """The xxhash64 bucket variant (zero per-char folding) runs on the
    same plan shape and scores every document."""
    docs = _docs(
        spark,
        [(i, "the quick brown fox " * (i + 1), "en", "s", 1) for i in range(5)],
    )
    s = X.classify_scores(F.col("text"), bucket_hash="xxhash")
    rows = docs.select("doc_id", *[c.alias(n) for n, c in s.items()]).collect()
    assert len(rows) == 5
    assert all(isinstance(r["web"], int) for r in rows)


def test_cms_mergeability(spark):
    """The distributed-correctness claim: sketches built on disjoint
    halves merge cell-wise into EXACTLY the whole-corpus sketch."""
    from flink_cdc_2_3_0_src_spark.functions.hashing import poly_hash_expr, tokens
    from flink_cdc_2_3_0_src_spark.operators.sketch import cms_build, cms_merge

    docs = _docs(
        spark,
        [(i, f"tok{i % 9} tok{i % 5} common word", "en", "s", 1) for i in range(40)],
    )
    h = docs.select(F.explode(tokens(F.col("text"))).alias("tok")).select(
        poly_hash_expr(F.col("tok")).alias("h")
    )
    whole = cms_build(h, width=64)
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)

    def hh(d):
        return d.select(F.explode(tokens(F.col("text"))).alias("tok")).select(
            poly_hash_expr(F.col("tok")).alias("h")
        )

    merged = cms_merge(cms_build(hh(half_a), width=64), cms_build(hh(half_b), width=64))
    assert merged == whole


# --- HyperLogLog cardinality sketch (operators/sketch.py) ---


def test_hll_accuracy_large_vocab(spark):
    """Raw-estimate branch: a vocabulary far above the 2.5m linear-
    counting threshold estimates within the 3-sigma band of the m=64
    standard error (~13%); every register is hit."""
    from flink_cdc_2_3_0_src_spark.operators.sketch import hll_distinct

    # 200 docs x 40 tokens, all distinct: exact vocabulary = 8000
    docs = _docs(
        spark,
        [(i, " ".join(f"tok{i}_{j}" for j in range(40)), "en", "s", 1)
         for i in range(200)],
    )
    r = hll_distinct(docs).collect()[0]
    assert r["zero_registers"] == 0
    assert abs(r["est_distinct"] - 8000) / 8000 < 0.40  # 3 sigma = 39%


def test_hll_small_range_linear_counting(spark):
    """A tiny vocabulary routes through the linear-counting lookup
    (zero registers present) and lands within +-3 of exact."""
    from flink_cdc_2_3_0_src_spark.operators.sketch import hll_distinct

    docs = _docs(
        spark, [(i, "alpha beta gamma delta epsilon", "en", "s", 1) for i in range(9)]
    )
    r = hll_distinct(docs).collect()[0]
    assert r["zero_registers"] > 0
    assert abs(r["est_distinct"] - 5) <= 3


def test_hll_duplicate_insensitive(spark):
    """Cardinality sketches ignore multiplicity: a corpus with every
    token repeated 50x yields the identical register state and estimate
    as the deduplicated corpus."""
    from flink_cdc_2_3_0_src_spark.operators.sketch import hll_distinct

    base = [(i, f"u{i} v{i} shared", "en", "s", 1) for i in range(20)]
    dup = [(i + 1000 * k, t, l, s, n) for (i, t, l, s, n) in base for k in range(50)]
    a = hll_distinct(_docs(spark, base)).collect()[0]
    b = hll_distinct(_docs(spark, dup)).collect()[0]
    assert (a["zero_registers"], a["sum_scaled"], a["est_distinct"]) == (
        b["zero_registers"], b["sum_scaled"], b["est_distinct"])


def test_hll_register_mergeability(spark):
    """The distributed-correctness claim: element-wise MIN of register
    states built on disjoint halves reproduces the whole-corpus state,
    and re-running the module's integer estimate math on the merged
    state reproduces hll_distinct's answer exactly."""
    from flink_cdc_2_3_0_src_spark.operators import sketch as S
    from flink_cdc_2_3_0_src_spark.operators.sketch import (
        hll_distinct, hll_doc_registers)

    docs = _docs(
        spark,
        [(i, " ".join(f"w{(i * 13 + j) % 500}" for j in range(25)), "en", "s", 1)
         for i in range(60)],
    )
    whole = hll_distinct(docs).collect()[0]

    def merged_regs(d):
        rows = d.select(hll_doc_registers(F.col("text")).alias("r")).collect()
        out = [S._HLL_EMPTY] * S.HLL_M
        for row in rows:
            out = [min(a, b) for a, b in zip(out, row["r"])]
        return out

    half_a = merged_regs(docs.filter(F.col("doc_id") % 2 == 0))
    half_b = merged_regs(docs.filter(F.col("doc_id") % 2 == 1))
    regs = [min(a, b) for a, b in zip(half_a, half_b)]
    ss = sum(regs)
    zeros = sum(1 for x in regs if x == S._HLL_EMPTY)
    raw = S._HLL_NUM // (S._HLL_DEN * ss)
    est = S._HLL_LINEAR[zeros - 1] if zeros > 0 and raw <= S._HLL_SMALL else raw
    assert (zeros, ss, est) == (
        whole["zero_registers"], whole["sum_scaled"], whole["est_distinct"])


# --- histogram quantile sketch (operators/sketch.py) ---


def test_histogram_quantiles_bound_contains_exact(spark):
    """With a value range wider than the bin count (bin width > 1),
    every quantile's [est_lo, est_hi] interval must contain the exact
    percentile_disc value and be narrower than one bin width."""
    import math

    from flink_cdc_2_3_0_src_spark.operators.sketch import (
        QH_BINS, histogram_quantiles)

    # token counts 1..~2000 -> bin width ceil(2000/256) = 8
    rows = [(i, " ".join("t" for _ in range((i * 37) % 2000 + 1)), "en",
             f"s{i % 2}", 1) for i in range(300)]
    out = histogram_quantiles(_docs(spark, rows)).collect()
    lens = {}
    for i, t, _, s, _ in rows:
        lens.setdefault(s, []).append((i * 37) % 2000 + 1)
    for r in out:
        vals = sorted(lens[r[0]])
        exact = vals[min(len(vals) - 1, max(0, math.ceil(r["q"] / 100 * len(vals)) - 1))]
        assert r["est_lo"] <= exact <= r["est_hi"], (r, exact)
        assert r["est_hi"] - r["est_lo"] < 8 + 1


def test_histogram_quantiles_degenerate_constant(spark):
    """All docs the same length: a single bin, every quantile exact."""
    from flink_cdc_2_3_0_src_spark.operators.sketch import histogram_quantiles

    docs = _docs(spark, [(i, "a b c d e", "en", "s", 1) for i in range(40)])
    out = histogram_quantiles(docs).collect()
    assert len(out) == 3
    assert all(r["est_lo"] == r["est_hi"] == 5 for r in out)


def test_histogram_cells_merge_across_halves(spark):
    """The histogram monoid: per-(group, bin) counts built on disjoint
    halves ADD to the whole-corpus cells (given the same global
    (min, max) frame) — the property map-side partials rely on."""
    from collections import Counter

    rows = [(i, " ".join("t" for _ in range(i % 97 + 1)), "en", "s", 1)
            for i in range(200)]
    vmin, vmax = 1, 97
    wdt = max(1, -((vmin - vmax - 1) // 256))

    def cells(subset):
        c = Counter()
        for i, *_ in subset:
            v = i % 97 + 1
            c[min(255, (v - vmin) // wdt)] += 1
        return c

    whole = cells(rows)
    merged = cells([r for r in rows if r[0] % 2 == 0])
    merged.update(cells([r for r in rows if r[0] % 2 == 1]))
    assert merged == whole


# --- priority sampling (operators/sampling.py) ---


def test_priority_sample_matches_exact_rational_ordering(spark):
    """The integer floor(w*P/u) key must induce the same selection and
    order as the exact rational priority w/(u/P) with doc_id
    tie-breaks — cross-checked against Fractions in Python."""
    from fractions import Fraction

    from flink_cdc_2_3_0_src_spark.operators import sampling as S

    docs = _docs(
        spark,
        [(i, " ".join(f"t{j}" for j in range((i * 7) % 23 + 1)), "en", "s", 1)
         for i in range(120)],
    )
    got = [r["doc_id"] for r in S.priority_sample(docs, k=15).collect()]

    def u_of(doc_id):
        h1 = (S._A1 * (doc_id % S._P) + S._B1) % S._P
        return ((S._A2 * h1 + S._B2) % S._P) + 1

    exact = sorted(
        ((Fraction((((i * 7) % 23 + 1)) * S._P, u_of(i)), -i) for i in range(120)),
        reverse=True,
    )
    want = [-neg for _, neg in exact[:15]]
    assert got == want


def test_priority_sample_prefix_property(spark):
    """Priority sampling is nested: the top-k sample is a prefix of the
    top-2k sample (same keys, same order), so growing a sample never
    resamples — the resumability property a long pipeline needs."""
    from flink_cdc_2_3_0_src_spark.operators.sampling import priority_sample

    docs = _docs(
        spark,
        [(i, " ".join(f"x{j}" for j in range(i % 31 + 1)), "en", "s", 1)
         for i in range(200)],
    )
    small = [r["doc_id"] for r in priority_sample(docs, k=10).collect()]
    big = [r["doc_id"] for r in priority_sample(docs, k=20).collect()]
    assert big[:10] == small


def test_priority_sample_estimator_total(spark):
    """DLT guarantee, one realization: sum(adjusted_weight) estimates
    the exact corpus token total (loose single-draw band)."""
    from flink_cdc_2_3_0_src_spark.operators.sampling import priority_sample

    rows = [(i, " ".join(f"t{j}" for j in range(i % 47 + 1)), "en", "s", 1)
            for i in range(400)]
    exact_total = sum(i % 47 + 1 for i in range(400))
    out = priority_sample(_docs(spark, rows), k=60).collect()
    est = sum(r["adjusted_weight"] for r in out)
    assert 0.6 * exact_total < est < 1.6 * exact_total


def test_priority_sample_plan_shape(spark):
    """The scale claims, pinned: selection is TakeOrderedAndProject
    (per-partition heaps, no global sort of the corpus) and the corpus
    is scanned exactly ONCE (the tau branch reuses the checkpointed
    k+1-row frame instead of re-deriving keys)."""
    from flink_cdc_2_3_0_src_spark.io import load_table
    from flink_cdc_2_3_0_src_spark.operators.sampling import priority_sample

    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    plan = (
        priority_sample(docs, k=20)._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert plan.count("FileScan") == 0  # both branches read the checkpoint
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_hll_plan_shape(spark):
    """One Arrow-batched projection + one fixed-width aggregation: the
    HLL plan has exactly one shuffle exchange (the 64-min groupBy) and
    no row-at-a-time Python."""
    from flink_cdc_2_3_0_src_spark.io import load_table
    from flink_cdc_2_3_0_src_spark.operators.sketch import hll_distinct

    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    plan = hll_distinct(docs)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    # shuffle exchanges: the groupBy plus the final tiny orderBy
    import re

    shuffles = len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning)", plan))
    assert shuffles <= 2


def test_priority_sample_huge_doc_ids_match_duckdb(spark):
    """doc_id near 2^33 (a realistic 100 TB id space): the mix reduces
    doc_id mod P BEFORE the first multiply, so int64 never wraps —
    Spark wraps silently where DuckDB raises, and without the pre-mod
    the two engines would split here."""
    import duckdb

    from flink_cdc_2_3_0_src_spark.operators.sampling import (
        priority_sample, priority_sample_sql)

    base = 8_589_934_592  # 2^33
    rows = [(base + i, " ".join(f"t{j}" for j in range(i % 13 + 1)), "en", "s", 1)
            for i in range(50)]
    got = [tuple(r) for r in priority_sample(_docs(spark, rows), k=10).collect()]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({d}, '{t}', 's')" for d, t, *_ in rows)
        + ") v(doc_id, text, source)"
    )
    want = [tuple(r) for r in con.execute(priority_sample_sql(10)).fetchall()]
    assert got == want


def test_priority_sample_custom_weight_col(spark):
    """weight_col switches the sampling weight off token counts; the
    returned w column reflects it and selection follows the new key."""
    from flink_cdc_2_3_0_src_spark.operators.sampling import priority_sample

    docs = _docs(
        spark, [(i, "one two", "en", "s", 1) for i in range(30)]
    ).withColumn("n_bytes", (F.col("doc_id") % 5 + 1) * 100)
    out = priority_sample(docs, k=8, weight_col="n_bytes").collect()
    assert len(out) == 8
    assert all(r["w"] % 100 == 0 for r in out)


def test_priority_sample_small_corpus_returns_all(spark):
    """Corpus <= k: every doc comes back, tau = 0, adjusted == weight."""
    from flink_cdc_2_3_0_src_spark.operators.sampling import priority_sample

    docs = _docs(spark, [(i, "a b c", "en", "s", 1) for i in range(7)])
    out = priority_sample(docs, k=50).collect()
    assert len(out) == 7
    assert all(r["adjusted_weight"] == r["w"] == 3 for r in out)


# --- round-5 ADVICE regression guards ---


def test_bloom_build_rejects_invalid_m_bits(spark):
    """A non-multiple-of-32 m_bits must be rejected at BUILD time, not
    only in the SQL twin: silently truncating the bitmap while the probe
    derives a different modulus from len(bitmap)*32 produces false
    negatives (ADVICE r4: m_bits=100 passed only 28/50 true matches)."""
    import pytest

    from flink_cdc_2_3_0_src_spark.operators import bloom as B

    dim = spark.range(50).select(F.col("id").alias("dk"))
    fact = spark.range(200).select(F.col("id").alias("fk"))
    with pytest.raises(ValueError, match="multiple of 32"):
        B.bloom_prefilter(fact, "fk", dim, "dk", m_bits=100)
    with pytest.raises(ValueError, match="multiple of 32"):
        B.bloom_build(dim, "dk", m_bits=0)
    # valid sizes keep the never-false-negative guarantee
    out = B.bloom_prefilter(fact, "fk", dim, "dk", m_bits=96)
    got = {r["fk"] for r in out.collect()}
    assert set(range(50)) <= got


def test_zorder_stats_empty_and_null_inputs_raise(spark):
    import pytest

    from flink_cdc_2_3_0_src_spark.operators.layout import zorder_layout_stats

    empty = spark.createDataFrame([], "x bigint, y bigint")
    with pytest.raises(ValueError, match="no non-NULL"):
        zorder_layout_stats(empty, ["x", "y"], n_buckets=2)
    nulls = spark.createDataFrame([(1, None), (2, None)], "x bigint, y bigint")
    with pytest.raises(ValueError, match="no non-NULL"):
        zorder_layout_stats(nulls, ["x", "y"], n_buckets=2)


def test_zorder_stats_range_overflow_raises(spark):
    """(mx - mn) * (2^bits - 1) past int64 would silently wrap in Spark
    while DuckDB raises — reject it up front instead of diverging."""
    import pytest

    from flink_cdc_2_3_0_src_spark.operators.layout import zorder_layout_stats

    wide = spark.createDataFrame(
        [(0, 0), (2 * 10**14, 1)], "x bigint, y bigint"
    )
    with pytest.raises(ValueError, match="overflows int64"):
        zorder_layout_stats(wide, ["x", "y"], n_buckets=2)


def test_forget_keys_returns_pair(spark):
    from flink_cdc_2_3_0_src_spark.operators.changelog import forget_keys

    state = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"
    )
    forget = spark.createDataFrame([(2,)], "k bigint")
    kept, log = forget_keys(state, forget, ["k"])
    assert {r["k"] for r in kept.collect()} == {1, 3}
    lrows = log.collect()
    assert [r["k"] for r in lrows] == [2] and lrows[0]["_op"] == "-D"


def test_normalize_text_contract(spark):
    """NFC composition, control strip, whitespace collapse, trim — and
    idempotence (normalizing twice changes nothing)."""
    from flink_cdc_2_3_0_src_spark.operators.text import normalize_text

    df = spark.createDataFrame(
        [
            (1, "cafe\u0301 latte"),
            (2, "café latte"),           # already NFC: same result
            (3, "a\x00b\x07c\x1fd"),          # controls stripped
            (4, "  x \t\t y \n\n z  "),       # runs collapsed, trimmed
            (5, None),
            (6, "ﬁn"),                   # ﬁ ligature: NFC keeps it
        ],
        "id bigint, t string",
    )
    once = df.select("id", normalize_text(F.col("t")).alias("n"))
    rows = {r["id"]: r["n"] for r in once.collect()}
    assert rows[1] == rows[2] == "café latte"
    assert rows[3] == "abcd"
    assert rows[4] == "x y z"
    assert rows[5] is None
    assert rows[6] == "ﬁn"  # NFC != NFKC: no compatibility expansion
    twice = {
        r["id"]: r["n2"]
        for r in once.select(
            "id", normalize_text(F.col("n")).alias("n2")
        ).collect()
    }
    assert twice == rows


def test_token_budget_select_greedy_semantics(spark):
    """Constructed fixture pins the greedy contract: rank by (quality
    DESC, doc_id ASC), keep while the INCLUSIVE running token total fits
    the budget — including the partial boundary bucket where several
    docs share the cutoff quality value."""
    from flink_cdc_2_3_0_src_spark.operators.mixing import token_budget_select

    # quality here is driven by token count (len factor); craft doc
    # texts from stopword-free unique tokens so quality orders by size
    def text(n, tag):
        return " ".join(f"w{tag}{i}" for i in range(n))

    rows = [
        (1, text(40, "a"), "s"),   # highest quality (40 toks)
        (2, text(30, "b"), "s"),
        (3, text(30, "c"), "s"),   # same quality as doc 2 -> id tiebreak
        (4, text(10, "d"), "s"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # total = 110 tokens; budget_num/den = 7/11 -> budget = 70
    out = token_budget_select(docs, budget_num=7, budget_den=11)
    got = sorted(r["doc_id"] for r in out.collect())
    # greedy: 40 (doc1) + 30 (doc2) = 70 fits; doc3 would exceed; doc4
    # is lower quality and never reached
    assert got == [1, 2]
    # raise the budget to 100: doc3 now fits too, doc4 (10) would push
    # to 110 > 100
    out2 = token_budget_select(docs, budget_num=10, budget_den=11)
    assert sorted(r["doc_id"] for r in out2.collect()) == [1, 2, 3]


def test_sequence_pack_spans_contract(spark):
    """Constructed fixture: exact offsets, window straddling, zero-token
    doc dropped, bucket-boundary continuity (doc_ids straddling the
    4096 coarse-bucket edge must see a continuous running total)."""
    from flink_cdc_2_3_0_src_spark.operators.mixing import sequence_pack_spans

    def text(n, tag):
        return " ".join(f"w{tag}{i}" for i in range(n))

    rows = [
        (1, text(5, "a"), "s"),
        (2, "", "s"),                 # zero tokens -> dropped
        (3, text(9, "b"), "s"),       # starts at 5, ends 13 -> bins 0..1
        (4095, text(4, "c"), "s"),    # last doc of bucket 0
        (4096, text(4, "d"), "s"),    # first doc of bucket 1
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["doc_id"]: r for r in sequence_pack_spans(docs, capacity=8).collect()}
    assert set(out) == {1, 3, 4095, 4096}
    assert (out[1]["start"], out[1]["first_bin"], out[1]["last_bin"]) == (0, 0, 0)
    # doc 3: tokens 5..13 -> straddles windows 0 and 1 at capacity 8
    assert (out[3]["start"], out[3]["first_bin"], out[3]["last_bin"]) == (5, 0, 1)
    # continuity across the coarse-bucket edge: 5 + 9 + 4 = 18
    assert out[4095]["start"] == 14
    assert out[4096]["start"] == 18


def test_token_budget_boundary_bucket_bounded(spark):
    """Pathological corpus: every doc shares ONE rounded quality value,
    so the whole corpus IS the boundary bucket.  The two-phase doc_id-
    range subdivision must (a) keep the greedy-by-doc_id semantics
    exact across the 4096-range edges, and (b) leave no window in the
    plan partitioned by quality alone (which would sort the full bucket
    in one partition)."""
    from flink_cdc_2_3_0_src_spark.operators.mixing import token_budget_select

    # identical texts -> identical quality; doc_ids straddle the 4096
    # sub-bucket boundary so the prefix hand-off is exercised
    ids = list(range(4090, 4102))
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta", "s") for i in ids],
        "doc_id long, text string, source string",
    )
    # 12 docs x 4 tokens = 48 total; budget 7/12 -> floor(48*7/12) = 28
    # -> greedy by doc_id keeps the first 7 docs (28 tokens inclusive)
    out = token_budget_select(docs, budget_num=7, budget_den=12)
    assert sorted(r["doc_id"] for r in out.collect()) == ids[:7]
    plan = out._jdf.queryExecution().executedPlan().toString()
    # every per-doc window (the one ordered by doc_id) must be keyed by
    # (quality, sbkt), never quality alone
    doc_windows = [
        line
        for line in plan.splitlines()
        if "windowspecdefinition" in line and "doc_id#" in line
    ]
    assert doc_windows, plan  # the boundary window must exist
    for line in doc_windows:
        assert "sbkt#" in line, line


def test_hll_precision_parameter_cross_engine(spark):
    """m = 256 (std error ~6.5%): Spark and DuckDB still agree bit for
    bit, the estimate tightens vs m = 64, and invalid precisions fail
    loudly (below 64 the alpha rational drifts from the paper's pinned
    constants; above 256 the scaled numerator exceeds int64 on the
    32-bit fmix domain)."""
    import duckdb
    import pytest

    from flink_cdc_2_3_0_src_spark.operators.sketch import (
        hll_distinct, hll_distinct_sql, hll_params)

    rows = [(i, " ".join(f"tok{i}_{j}" for j in range(40)), "en", "s", 1)
            for i in range(200)]  # exact vocabulary = 8000
    got = [tuple(r) for r in hll_distinct(_docs(spark, rows), m=256).collect()]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({d}, '{t}', 's')" for d, t, *_ in rows)
        + ") v(doc_id, text, source)"
    )
    want = [tuple(r) for r in con.execute(hll_distinct_sql(m=256)).fetchall()]
    assert got == want
    est = got[0][3]
    assert abs(est - 8000) / 8000 < 0.20  # 3 sigma at m=256 = 19.5%

    for bad in (32, 100, 512):
        with pytest.raises(ValueError, match="power of two"):
            hll_params(bad)


def test_histogram_quantiles_null_text_dropped_both_engines(spark):
    """Null-text docs must be dropped on BOTH engines: a NULL bin sorts
    first in Spark's window but last in DuckDB's, so keeping it would
    silently split the cumulative counts."""
    import duckdb

    from flink_cdc_2_3_0_src_spark.operators.sketch import (
        histogram_quantiles, histogram_quantiles_sql)

    rows = [(i, " ".join("t" for _ in range(i % 11 + 1)), "en", "s", 1)
            for i in range(30)] + [(100, None, "en", "s", 1)]
    got = [tuple(r) for r in histogram_quantiles(_docs(spark, rows)).collect()]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({d}, {'NULL' if t is None else repr(t)}, 's')"
            for d, t, *_ in rows
        )
        + ") v(doc_id, text, source)"
    )
    want = [tuple(r) for r in con.execute(histogram_quantiles_sql()).fetchall()]
    assert got == want
    assert all(r[2] == 30 for r in got)  # n excludes the null-text doc


def test_hll_all_null_group_dropped_both_engines(spark):
    """A source whose every doc has null text must be ABSENT from the
    result on both engines (the oracle's WHERE text IS NOT NULL drops
    it; the Spark side now filters nulls before grouping instead of
    surfacing an empty-register group with estimate 0)."""
    import duckdb

    from flink_cdc_2_3_0_src_spark.operators.sketch import (
        hll_distinct, hll_distinct_sql)

    rows = [(1, "a b c", "en", "live", 1), (2, None, "en", "ghost", 1),
            (3, None, "en", "ghost", 1), (4, "a d", "en", "live", 1)]
    got = [tuple(r) for r in hll_distinct(_docs(spark, rows)).collect()]
    assert [r[0] for r in got] == ["live"]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        "(1, 'a b c', 'live'), (2, NULL, 'ghost'), "
        "(3, NULL, 'ghost'), (4, 'a d', 'live')"
        ") v(doc_id, text, source)"
    )
    want = [tuple(r) for r in con.execute(hll_distinct_sql()).fetchall()]
    assert got == want


def test_hll_tokenless_group_dropped_both_engines(spark):
    """A group whose texts are non-null but TOKEN-LESS (empty or
    whitespace-only) must be absent on both engines: the oracle's
    unnest emits no rows for it, and the Spark side drops the
    all-empty-register group (zero_registers == m) post-aggregation.
    Mixed groups keep their token-bearing estimate."""
    import duckdb

    from flink_cdc_2_3_0_src_spark.operators.sketch import (
        hll_distinct, hll_distinct_sql)

    rows = [(1, "a b c", "en", "live", 1), (2, "", "en", "blank", 1),
            (3, "   \t ", "en", "blank", 1), (4, "", "en", "live", 1)]
    got = [tuple(r) for r in hll_distinct(_docs(spark, rows)).collect()]
    assert [r[0] for r in got] == ["live"]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        "(1, 'a b c', 'live'), (2, '', 'blank'), "
        "(3, '   ', 'blank'), (4, '', 'live')"
        ") v(doc_id, text, source)"
    )
    want = [tuple(r) for r in con.execute(hll_distinct_sql()).fetchall()]
    assert got == want


def test_histogram_quantiles_empty_corpus_both_engines(spark):
    """An empty / all-null-text corpus returns ZERO rows with the
    output schema (the DuckDB twin's vals CTE is empty) instead of
    crashing on int(None) in the min/max fold."""
    import duckdb

    from flink_cdc_2_3_0_src_spark.operators.sketch import (
        histogram_quantiles, histogram_quantiles_sql)

    out = histogram_quantiles(_docs(spark, [(1, None, "en", "s0", 1)]))
    assert out.columns == [
        "source", "q", "n", "rank_r", "bin_idx", "est_lo", "est_hi"]
    assert out.count() == 0
    empty = histogram_quantiles(
        spark.createDataFrame(
            [], "doc_id bigint, text string, lang string, "
                "source string, n_chars bigint"))
    assert empty.count() == 0

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        "(1, CAST(NULL AS VARCHAR), 's0')) v(doc_id, text, source)"
    )
    assert con.execute(histogram_quantiles_sql()).fetchall() == []


def test_merge_hll_state_equals_one_shot_any_split(spark):
    """Incremental HLL register-state maintenance (the sketch member of
    the maintenance family): folding ingest batches through the MIN
    monoid and finalizing equals the one-shot hll_distinct over the
    whole corpus BIT-EXACTLY, for every batch split — the mergeability
    claim the sketch's design rests on, pinned in its incremental
    form.  Also covers: a batch whose group is all-tokenless leaves an
    all-empty register row that finalization drops, and later batches
    can resurrect the group."""
    from flink_cdc_2_3_0_src_spark.io import load_table
    from flink_cdc_2_3_0_src_spark.operators.sketch import (
        hll_distinct,
        hll_state_estimate,
        merge_hll_state,
    )
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    want = [tuple(r) for r in hll_distinct(docs).collect()]
    assert len(want) > 0
    hi = docs.agg(F.max("doc_id")).collect()[0][0]
    for nb in (1, 3):
        state = None
        for i in range(nb):
            lo = i * (int(hi) + 1) // nb
            up = (i + 1) * (int(hi) + 1) // nb
            cond = (F.col("doc_id") >= lo) & (F.col("doc_id") < up)
            if i == nb - 1:
                cond = F.col("doc_id") >= lo if nb > 1 else F.lit(True)
            state = merge_hll_state(state, docs.filter(cond)).localCheckpoint(
                eager=True
            )
        got = [tuple(r) for r in hll_state_estimate(state).collect()]
        assert got == want, f"n_batches={nb}"

    # tokenless-group lifecycle: batch 1 plants a group with only
    # whitespace text (all-empty registers -> dropped at finalize);
    # batch 2 adds a real doc to the group -> group appears
    def d(rows):
        return spark.createDataFrame(
            rows, "doc_id bigint, text string, source string"
        )

    s1 = merge_hll_state(None, d([(1, "   ", "empty_src")]))
    assert hll_state_estimate(s1).count() == 0
    s2 = merge_hll_state(s1, d([(2, "real tokens here", "empty_src")]))
    out = hll_state_estimate(s2).collect()
    assert len(out) == 1 and out[0]["est_distinct"] >= 3


def test_merge_hist_state_equals_one_shot_any_split(spark):
    """Incremental equi-width histogram cell maintenance (the
    distribution member of the sketch trio): folding ingest batches
    through the cell-count ADDITION monoid (with the domain fixed to
    the corpus min/max) and finalizing equals the one-shot
    histogram_quantiles BIT-EXACTLY, for every batch split.  Also
    pins the declared-domain clamp: values outside [vmin, vmax] land
    in the edge bins and still count toward n."""
    from flink_cdc_2_3_0_src_spark.io import load_table
    from flink_cdc_2_3_0_src_spark.operators.sketch import (
        docs_token_counts,
        hist_state_quantiles,
        histogram_quantiles,
        merge_hist_state,
    )
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    want = [tuple(r) for r in histogram_quantiles(docs).collect()]
    assert len(want) > 0
    lo_hi = docs_token_counts(docs).agg(F.min("v"), F.max("v")).collect()[0]
    vmin, vmax = int(lo_hi[0]), int(lo_hi[1])
    hi = docs.agg(F.max("doc_id")).collect()[0][0]
    for nb in (1, 3):
        state = None
        for i in range(nb):
            lo = i * (int(hi) + 1) // nb
            up = (i + 1) * (int(hi) + 1) // nb
            cond = (F.col("doc_id") >= lo) & (F.col("doc_id") < up)
            if i == nb - 1:
                cond = F.col("doc_id") >= lo if nb > 1 else F.lit(True)
            state = merge_hist_state(
                state, docs.filter(cond), vmin, vmax
            ).localCheckpoint(eager=True)
        got = [
            tuple(r) for r in hist_state_quantiles(state, vmin, vmax).collect()
        ]
        assert got == want, f"n_batches={nb}"

    # declared-domain clamp: domain [5, 8] with bins=4 -> width 1;
    # a 2-token doc clamps into bin 0, a 20-token doc into bin 3;
    # n counts all four docs
    def d(rows):
        return spark.createDataFrame(
            rows, "doc_id bigint, text string, source string"
        )

    batch = d([
        (1, "a b", "s"),                     # 2 tokens -> clamps to bin 0
        (2, "a b c d e", "s"),               # 5 tokens -> bin 0
        (3, "a b c d e f g h", "s"),         # 8 tokens -> bin 3
        (4, " ".join(["t"] * 20), "s"),      # 20 tokens -> clamps to bin 3
    ])
    st = merge_hist_state(None, batch, vmin=5, vmax=8, bins=4)
    cells = {(r["bin"], r["c"]) for r in st.collect()}
    assert cells == {(0, 2), (3, 2)}
    fin = hist_state_quantiles(st, 5, 8, quantiles=(50,), bins=4).collect()
    assert fin[0]["n"] == 4
