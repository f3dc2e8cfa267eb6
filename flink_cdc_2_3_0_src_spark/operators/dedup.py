"""Near-duplicate detection: MinHash+LSH, SimHash, n-gram Jaccard.

Spark-first designs:

  - MinHash+LSH: shingle → k minhash values → b bands of r rows →
    self-join on (band, key) → verify exact Jaccard on candidates only.
    The band join replaces the O(n²) all-pairs compare with an equi-join
    — the scale path for 100 TB corpora (shuffle on band key, candidate
    set ≪ n²).
  - SimHash: 32-bit signature from per-token hash bit votes; one
    explode + one aggregation (two narrow shuffles), no UDFs.
  - n-gram Jaccard: exact verification metric, computed only on
    LSH candidates or within a blocking key.

Every constant is shared with the DuckDB oracle twins below.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_cdc_2_3_0_src_spark.functions.hashing import (
    MERSENNE_P,
    minhash_params,
    minhash_sig_text,
    poly_hash_array,
    shingles_text,
    simhash_text,
    sql_poly_hash,
    sql_tokens,
)

MINHASH_K = 16
LSH_BANDS = 4
LSH_ROWS = 4  # k = bands * rows
JACCARD_THRESHOLD = 0.5
SIMHASH_BITS = 32


def shingle_sets(docs: DataFrame, n: int = 3) -> DataFrame:
    """doc_id + distinct n-word shingles + their hashes."""
    return docs.select(
        "doc_id",
        shingles_text(F.col("text"), n).alias("shingles"),
    ).withColumn("hashes", poly_hash_array(F.col("shingles")))


def minhash_sigs(docs: DataFrame, k: int = MINHASH_K) -> DataFrame:
    ss = docs.select("doc_id", minhash_sig_text(F.col("text"), k).alias("sig"))
    return ss.select(
        "doc_id", *[F.element_at("sig", j + 1).alias(f"sig_{j}") for j in range(k)]
    )


def lsh_pairs(
    docs: DataFrame,
    bands: int = LSH_BANDS,
    rows: int = LSH_ROWS,
    threshold: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """Candidate pairs via banded LSH, verified with exact Jaccard."""
    with_sigs = docs.select(
        "doc_id",
        shingles_text(F.col("text")).alias("shingles"),
        minhash_sig_text(F.col("text"), bands * rows).alias("sig"),
    )
    band_structs = F.array(
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
    banded = (
        with_sigs.select("doc_id", "shingles", F.explode(band_structs).alias("bk"))
        .select(
            "doc_id",
            "shingles",
            F.col("bk.band").alias("band"),
            F.col("bk.key").alias("key"),
        )
        # truncate lineage: the self-join must not re-run the UDF pipeline
        # (or race two cache populations) on both sides
        .localCheckpoint()
    )

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    jac = F.round(
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        6,
    )
    return (
        cand.withColumn("jaccard", jac)
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
    docs: DataFrame, block_cols: list[str], threshold: float
) -> DataFrame:
    """Exact shingle-Jaccard within a blocking key (source, lang) —
    the blocked-join shape for when LSH recall isn't wanted."""
    d = docs.select(
        *block_cols, "doc_id", shingles_text(F.col("text"), 3).alias("sh")
    ).localCheckpoint()
    a, b = d.alias("a"), d.alias("b")
    cond = (F.col("a.doc_id") < F.col("b.doc_id"))
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    jac = F.round(
        F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh"))).cast("double")
        / F.size(F.array_union(F.col("a.sh"), F.col("b.sh"))).cast("double"),
        6,
    )
    return (
        a.join(b, cond)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------------------------------
# DuckDB oracle twins
# --------------------------------------------------------------------------

_SHINGLES_CTE = f"""
    tk AS (
        SELECT doc_id, {sql_tokens('text')} AS toks FROM documents
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(CASE WHEN len(toks) >= 3
                 THEN [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                       for i in generate_series(1, len(toks) - 2)]
                 ELSE [array_to_string(toks, ' ')] END) AS shingles
        FROM tk
    ),
    hs AS (
        SELECT doc_id, shingles,
               [{sql_poly_hash('s')} for s in shingles] AS hashes
        FROM sh
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

LSH_PAIRS_SQL = f"""
    WITH {_SHINGLES_CTE},
    sigs AS (
        SELECT doc_id, shingles,
               {_sql_sig_cols(LSH_BANDS * LSH_ROWS)}
        FROM hs
    ),
    banded AS (
        SELECT doc_id, shingles, u.bk[1] AS band, u.bk[2] AS key
        FROM sigs, UNNEST([{_BAND_KEYS}]) AS u(bk)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.shingles AS sh_a, b.shingles AS sh_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           round(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
                 / CAST(len(list_distinct(list_concat(sh_a, sh_b))) AS DOUBLE), 6) AS jaccard
    FROM cand
    WHERE round(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
                / CAST(len(list_distinct(list_concat(sh_a, sh_b))) AS DOUBLE), 6) >= {JACCARD_THRESHOLD}
"""

_SIMHASH_VOTES = ",\n               ".join(
    f"SUM(CASE WHEN (h & {1 << b}) != 0 THEN 1 ELSE -1 END) AS v{b}"
    for b in range(SIMHASH_BITS)
)
_SIMHASH_SUM = " + ".join(
    f"CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(SIMHASH_BITS)
)

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

NGRAM_JACCARD_SQL = f"""
    WITH tk AS (
        SELECT doc_id, source, lang, {sql_tokens('text')} AS toks FROM documents
    ),
    sh AS (
        SELECT doc_id, source, lang,
               list_distinct(CASE WHEN len(toks) >= 3
                 THEN [toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                       for i in generate_series(1, len(toks) - 2)]
                 ELSE [array_to_string(toks, ' ')] END) AS sh
        FROM tk
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                 / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) AS jaccard
    FROM sh a JOIN sh b
      ON a.source = b.source AND a.lang = b.lang AND a.doc_id < b.doc_id
    WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE), 6) >= 0.1
"""
