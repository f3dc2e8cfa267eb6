"""Bloom-filter runtime semi-join — pre-filter a huge fact scan with a
tiny bitmap built from the dim side's join keys.

At 100 TB the dominant join cost is shuffling fact rows that will never
match.  The standard fix (Spark's own runtime bloom-filter join, made
explicit and engine-portable here) is: aggregate the dim side's keys
into an m-bit Bloom bitmap (m/32 words — kilobytes), broadcast it, and
drop non-matching fact rows AT THE SCAN, before any exchange.  Only
Bloom *candidates* (true matches + a bounded false-positive residue)
reach the real join.

Everything is exact integer arithmetic on a fixed hash family
(h_i(x) = ((a_i * (x mod P) + b_i) mod P) mod m, P = 2^31-1), so the
bitmap — and therefore the exact false-positive count — is
deterministic and identical in any engine; the DuckDB oracle rebuilds
the same filter bit-for-bit.

Word layout: 32-bit words stored in BIGINTs (word = bit >> 5,
mask = 1 << (bit & 31)) — masks stay below 2^31, so shifting never
touches a sign bit in either engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_P = 2_147_483_647  # 2^31 - 1
# fixed affine hash family (any constants work; pinned for determinism)
_HASHES = [(998_244_353, 12_289), (805_306_457, 37), (1_000_000_007, 65_537)]
DEFAULT_M_BITS = 8_192


def _bit_positions(key_col, m_bits: int):
    """List of Bloom bit positions for an integer key column.  pmod
    keeps positions in [0, m_bits) for negative keys too (Spark's and
    DuckDB's `%` both take the dividend's sign)."""
    x = (key_col.cast("long") % _P + _P) % _P
    return [
        ((F.lit(a) * x + F.lit(b)) % _P) % m_bits for a, b in _HASHES
    ]


def _check_m_bits(m_bits: int) -> None:
    # the bitmap is stored as 32-bit words and the probe derives m_bits
    # back from the word count — a non-multiple of 32 would drop the
    # tail bits on the build side and hash with a DIFFERENT modulus on
    # the probe side (false negatives)
    if m_bits <= 0 or m_bits % 32 != 0:
        raise ValueError(f"m_bits must be a positive multiple of 32, got {m_bits}")


def bloom_build(dim: DataFrame, dim_key: str, m_bits: int = DEFAULT_M_BITS) -> list[int]:
    """Aggregate the dim side's keys into the m-bit bitmap.  The
    groupBy folds (distinct keys × 3) bit rows into at most m/32 words —
    the collect is bounded by m_bits, independent of data size (the
    centroid-collect pattern; Spark's own runtime bloom join ships the
    filter the same way, as a subquery result)."""
    # validate here too (not only in the SQL twin): a non-multiple-of-32
    # m_bits would build a truncated bitmap while the probe derives a
    # DIFFERENT modulus from len(bitmap)*32 — false negatives
    _check_m_bits(m_bits)
    dk = dim.select(F.col(dim_key).alias("k")).filter(F.col("k").isNotNull()).distinct()
    bits = dk.select(
        F.explode(F.array(*_bit_positions(F.col("k"), m_bits))).alias("bit")
    )
    words = (
        bits.select(
            (F.col("bit") / 32).cast("long").alias("w"),
            F.pow(F.lit(2.0), (F.col("bit") % 32).cast("int")).cast("long").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("word"))
    )
    wmap = {int(r["w"]): int(r["word"]) for r in words.collect()}
    return [wmap.get(i, 0) for i in range(m_bits // 32)]


def bloom_pass_expr(key_col, bitmap: list[int]):
    """Membership test as a pure column expression (evaluated at the
    scan: no join, no exchange).  May false-positive, never
    false-negative."""
    m_bits = len(bitmap) * 32
    # one parsed literal instead of len(bitmap) py4j F.lit calls
    # (~1ms each of driver time per build; see functions/exprs.py)
    from flink_cdc_2_3_0_src_spark.functions.exprs import lit_array

    lit_words = lit_array(bitmap, "bigint")
    pass_expr = None
    for bit in _bit_positions(key_col, m_bits):
        word = F.element_at(lit_words, (bit / 32).cast("int") + 1)
        mask = F.pow(F.lit(2.0), (bit % 32).cast("int")).cast("long")
        hit = word.bitwiseAND(mask) != 0
        pass_expr = hit if pass_expr is None else (pass_expr & hit)
    return pass_expr


def bloom_prefilter(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    m_bits: int = DEFAULT_M_BITS,
) -> DataFrame:
    """The usable operator: fact rows (all columns) surviving the Bloom
    pre-filter built from the dim side — feed this to the real join so
    only candidates shuffle."""
    bitmap = bloom_build(dim, dim_key, m_bits)
    return fact.filter(
        F.col(fact_key).isNotNull() & bloom_pass_expr(F.col(fact_key), bitmap)
    )


def bloom_semi_join_stats(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    m_bits: int = DEFAULT_M_BITS,
) -> DataFrame:
    """One summary row: fact size, Bloom-pass count, true-match count,
    and the false-positive residue the bitmap let through."""
    dk = dim.select(F.col(dim_key).alias("k")).filter(F.col("k").isNotNull()).distinct()
    bitmap = bloom_build(dim, dim_key, m_bits)
    fk = fact.select(F.col(fact_key).alias("k")).filter(F.col("k").isNotNull())
    passed = fk.filter(bloom_pass_expr(F.col("k"), bitmap))
    truth = F.broadcast(dk.withColumn("_t", F.lit(1)))
    joined = passed.join(truth, "k", "left")
    return (
        fk.agg(F.count(F.lit(1)).alias("n_fact"))
        .crossJoin(
            joined.agg(
                F.count(F.lit(1)).alias("n_bloom_pass"),
                F.sum(F.when(F.col("_t").isNotNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_true_match"),
            )
        )
        .select(
            "n_fact",
            "n_bloom_pass",
            "n_true_match",
            (F.col("n_bloom_pass") - F.col("n_true_match")).alias("n_false_pos"),
        )
    )


def bloom_semi_join_sql(
    fact_table: str,
    fact_key: str,
    dim_sql: str,
    m_bits: int = DEFAULT_M_BITS,
) -> str:
    """DuckDB twin: rebuilds the identical bitmap and probe.  ``dim_sql``
    must select one column named ``k`` (the dim keys, pre-filtered)."""
    _check_m_bits(m_bits)
    n_h = len(_HASHES)
    hash_list = ", ".join(
        f"(({a} * ((CAST(k AS BIGINT) % {_P} + {_P}) % {_P}) + {b}) % {_P}) % {m_bits}"
        for a, b in _HASHES
    )
    probe_hashes = ", ".join(
        f"(({a} * ((CAST(k AS BIGINT) % {_P} + {_P}) % {_P}) + {b}) % {_P}) % {m_bits}"
        for a, b in _HASHES
    )
    return f"""
    WITH dk AS (SELECT DISTINCT k FROM ({dim_sql}) WHERE k IS NOT NULL),
    bits AS (
        SELECT unnest([{hash_list}]) AS bit FROM dk
    ),
    words AS (
        SELECT CAST(bit // 32 AS BIGINT) AS w,
               bit_or(CAST(1 AS BIGINT) << CAST(bit % 32 AS INTEGER)) AS word
        FROM bits GROUP BY 1
    ),
    fk AS (
        SELECT {fact_key} AS k FROM {fact_table} WHERE {fact_key} IS NOT NULL
    ),
    lookups AS (
        SELECT rowid AS fid, k, unnest([{probe_hashes}]) AS bit
        FROM (SELECT k, ROW_NUMBER() OVER () AS rowid FROM fk)
    ),
    passed AS (
        SELECT l.k
        FROM lookups l LEFT JOIN words w ON CAST(l.bit // 32 AS BIGINT) = w.w
        GROUP BY l.fid, l.k
        HAVING SUM(CASE WHEN w.word IS NOT NULL
                        AND (w.word & (CAST(1 AS BIGINT) << CAST(l.bit % 32 AS INTEGER))) <> 0
                   THEN 1 ELSE 0 END) = {n_h}
    ),
    joined AS (
        SELECT p.k, d.k AS dk FROM passed p LEFT JOIN dk d ON p.k = d.k
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM fk) AS n_fact,
           CAST(COUNT(*) AS BIGINT) AS n_bloom_pass,
           CAST(SUM(CASE WHEN dk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_true_match,
           CAST(COUNT(*) - SUM(CASE WHEN dk IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_false_pos
    FROM joined
    """
