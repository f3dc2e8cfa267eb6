"""Portable deterministic hashing — identical results in Spark and DuckDB.

The correctness gate runs every query against a DuckDB oracle, so the
dedup/fingerprint operators need a hash function both engines compute
bit-identically. Built-ins (xxhash64, murmur) differ across engines;
instead we use a character-level polynomial rolling hash:

    H(s) = fold over code points c:  acc <- (acc * 31 + c) mod 1e9+7

computed by Arrow-batched pandas UDFs on the Spark side (see the
section note below for why not Catalyst higher-order functions) and
``list_reduce`` on the DuckDB side. Parity is fuzz-tested in
tests/test_properties.py (test_poly_hash_cross_engine_fuzz).

MinHash permutations are the classic  h_j(x) = (a_j * x + b_j) mod P
with P = 2^31-1 and (a_j, b_j) from a fixed LCG so both engines embed
the same literals.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

POLY_MOD = 1_000_000_007
POLY_MULT = 31
MERSENNE_P = 2_147_483_647  # 2^31 - 1

# ---- deterministic (a_j, b_j) for minhash permutations ----


def minhash_params(k: int) -> list[tuple[int, int]]:
    """k (a, b) pairs from a fixed LCG — same constants on both engines."""
    params = []
    state = 88172645463325252
    for _ in range(k):
        state = (6364136223846793005 * state + 1442695040888963407) % (2**64)
        a = (state >> 16) % (MERSENNE_P - 1) + 1  # a in [1, P-1]
        state = (6364136223846793005 * state + 1442695040888963407) % (2**64)
        b = (state >> 16) % MERSENNE_P
        params.append((a, b))
    return params


# --------------------------------------------------------------------------
# Spark side
#
# Spark's higher-order functions (transform/aggregate) are evaluated
# interpreted, not codegen'd — char-level hashing through them costs
# ~10 ms/row. The hot path therefore uses Arrow-batched Pandas UDFs
# (~100× faster); the column-expression variants are kept for parity
# tests and as documentation of the exact algorithm.
# --------------------------------------------------------------------------


def _py_poly_hash(x: str | None) -> int | None:
    if x is None:
        return None
    return _py_poly_hash_cached(x)


@__import__("functools").lru_cache(maxsize=1 << 18)
def _py_poly_hash_cached(x: str) -> int:
    # token frequency is Zipfian — memoizing turns per-token char loops
    # into dict hits for the vast majority of calls
    acc = 0
    for ch in x:
        acc = (acc * POLY_MULT + ord(ch)) % POLY_MOD
    return acc


# pandas_udf parses its DDL return type against the active session, so
# UDF objects must be created lazily (first use) and cached — caching
# also makes repeated references inside one plan structurally equal, so
# Spark's UDF extraction evaluates each distinct call once.
_UDF_CACHE: dict[str, object] = {}


def _cached(key: str, maker):
    if key not in _UDF_CACHE:
        _UDF_CACHE[key] = maker()
    return _UDF_CACHE[key]


def _make_poly_hash_udf():
    @F.pandas_udf("long")
    def _h(s: pd.Series) -> pd.Series:
        return s.map(_py_poly_hash)

    return _h


def _make_poly_hash_array_udf():
    @F.pandas_udf("array<long>")
    def _h(s: pd.Series) -> pd.Series:
        return s.map(
            lambda lst: None if lst is None else [_py_poly_hash(x) for x in lst]
        )

    return _h


def _make_simhash_udf(bits: int):
    bit_vals = np.array([1 << b for b in range(bits)], dtype=np.int64)

    @F.pandas_udf("long")
    def _sh(s: pd.Series) -> pd.Series:
        def sh(tokens_list):
            if tokens_list is None or len(tokens_list) == 0:
                return 0
            hs = np.array([_py_poly_hash(t) for t in tokens_list], dtype=np.int64)
            # votes[b] = sum over tokens of +-1 depending on bit b of hash
            bits_mat = (hs[:, None] & bit_vals[None, :]) != 0
            votes = np.where(bits_mat, 1, -1).sum(axis=0)
            return int((bit_vals * (votes > 0)).sum())

        return s.map(sh)

    return _sh


def _py_tokens(text: str) -> list[str]:
    """Python twin of tokens(): lowercase whitespace split, no empties.

    re's \\s on ASCII text matches exactly what Spark/DuckDB regex split
    does; all three tokenizers agree on the testdata corpus.
    """
    import re

    return [t for t in re.split(r"\s+", text.lower()) if t]


def _py_shingles(text: str, n: int) -> list[str]:
    toks = _py_tokens(text)
    if len(toks) >= n:
        sh = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    else:
        sh = [" ".join(toks)]
    seen: set[str] = set()
    out = []
    for s in sh:
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def _make_shingles_udf(n: int):
    @F.pandas_udf("array<string>")
    def _s(s: pd.Series) -> pd.Series:
        return s.map(lambda t: None if t is None else _py_shingles(t, n))

    return _s


def _py_shingle_hashes(text: str, n: int) -> "np.ndarray":
    """Distinct n-gram shingle hashes via token-hash combination.

    Each token is char-hashed ONCE; shingle hashes fold the n token
    hashes with the same polynomial step ((h*31 + th) mod M). ~10x less
    Python work than hashing shingle strings char-by-char, and the
    combine is a vectorized numpy slide. Mirrored exactly by
    sql_shingle_hashes()."""
    th = [_py_poly_hash(t) for t in _py_tokens(text)]
    if len(th) >= n:
        arr = np.array(th, dtype=np.int64)
        m = len(arr) - n + 1
        h = arr[:m].copy()
        for j in range(1, n):
            h = (h * POLY_MULT + arr[j : m + j]) % POLY_MOD
        return np.unique(h)
    acc = 0
    for x in th:
        acc = (acc * POLY_MULT + x) % POLY_MOD
    return np.array([acc], dtype=np.int64)


def _batch_shingle_hashes(texts, n: int):
    """Distinct shingle hashes for a whole Arrow batch, flat-vectorized.

    One sliding-window polynomial combine over the concatenation of all
    docs' token hashes (cross-doc windows masked out), then one global
    sort/unique keyed by (doc, hash) — the per-doc numpy-call overhead
    of the row-at-a-time formulation dominates on short docs; this runs
    the whole batch in a handful of numpy passes. Produces exactly
    _py_shingle_hashes(text, n) per doc.

    Returns (uniq_doc, uniq_hash, doc_offsets, none_mask): sorted flat
    (doc index, hash) pairs, start offset of each doc's slice in the
    flat arrays, and which inputs were None.
    """
    n_docs = len(texts)
    none_mask = np.zeros(n_docs, dtype=bool)
    th_parts: list[list[int]] = []
    counts = np.zeros(n_docs, dtype=np.int64)
    for i, text in enumerate(texts):
        if text is None:
            none_mask[i] = True
            th_parts.append([])
            continue
        th = [_py_poly_hash_cached(t) for t in _py_tokens(text)]
        th_parts.append(th)
        counts[i] = len(th)
    flat = np.concatenate(
        [np.asarray(p, dtype=np.int64) for p in th_parts if p]
        or [np.empty(0, dtype=np.int64)]
    )
    starts = np.concatenate(([0], np.cumsum(counts)))  # per-doc slice bounds
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)

    pair_keys = []
    total = flat.shape[0]
    if total >= n:
        m = total - n + 1
        h = flat[:m].copy()
        for j in range(1, n):
            h = (h * POLY_MULT + flat[j : m + j]) % POLY_MOD
        valid = doc_of[:m] == doc_of[n - 1 :]  # window fully inside one doc
        pair_keys.append((doc_of[:m][valid] << 31) | h[valid])
    # short docs (len < n, incl. empty -> hash 0) fold all their tokens
    short = np.flatnonzero(~none_mask & (counts < n))
    if short.size:
        folds = np.empty(short.size, dtype=np.int64)
        for idx, i in enumerate(short):
            acc = 0
            for x in th_parts[i]:
                acc = (acc * POLY_MULT + x) % POLY_MOD
            folds[idx] = acc
        pair_keys.append((short << 31) | folds)
    keys = (
        np.unique(np.concatenate(pair_keys))
        if pair_keys
        else np.empty(0, dtype=np.int64)
    )
    uniq_doc = keys >> 31
    uniq_hash = keys & ((1 << 31) - 1)  # POLY_MOD < 2^31: key packing is lossless
    doc_offsets = np.searchsorted(uniq_doc, np.arange(n_docs + 1))
    return uniq_doc, uniq_hash, doc_offsets, none_mask


def _make_shingle_profile_udf(k: int, n: int):
    """One pass: text → struct(hashes: distinct shingle hashes,
    sig: k-value minhash signature)."""
    params = minhash_params(k)

    @F.pandas_udf("struct<hashes: array<long>, sig: array<long>>")
    def _p(s: pd.Series) -> pd.Series:
        texts = s.tolist()
        _, uniq_hash, offs, none_mask = _batch_shingle_hashes(texts, n)
        nonempty = offs[:-1] < offs[1:]
        # k segment-mins over the flat unique-hash array (reduceat needs
        # non-empty segments; empty/None docs are filled afterwards)
        red_offs = offs[:-1][nonempty]
        sig_mat = np.empty((len(params), red_offs.shape[0]), dtype=np.int64)
        for j, (a, b) in enumerate(params):
            v = (a * uniq_hash + b) % MERSENNE_P
            sig_mat[j] = (
                np.minimum.reduceat(v, red_offs)
                if red_offs.shape[0]
                else np.empty(0, dtype=np.int64)
            )
        hs_out, sig_out = [], []
        seg = 0
        for i in range(len(texts)):
            if none_mask[i]:
                hs_out.append(None)
                sig_out.append(None)
                continue
            hs_out.append([int(x) for x in uniq_hash[offs[i] : offs[i + 1]]])
            if nonempty[i]:
                sig_out.append([int(x) for x in sig_mat[:, seg]])
                seg += 1
            else:  # unreachable for str input (empty text still hashes to [0])
                sig_out.append([int(b % MERSENNE_P) for _, b in params])
        return pd.DataFrame({"hashes": hs_out, "sig": sig_out})

    return _p


def _make_minhash_text_udf(k: int, n: int):
    params = minhash_params(k)

    @F.pandas_udf("array<long>")
    def _m(s: pd.Series) -> pd.Series:
        def sig(text):
            if text is None:
                return None
            hs = np.array(
                [_py_poly_hash(x) for x in _py_shingles(text, n)], dtype=np.int64
            )
            if hs.size == 0:
                return None
            return [int(((a * hs + b) % MERSENNE_P).min()) for a, b in params]

        return s.map(sig)

    return _m


def _make_simhash_text_udf(bits: int):
    bit_vals = np.array([1 << b for b in range(bits)], dtype=np.int64)

    @F.pandas_udf("long")
    def _sh(s: pd.Series) -> pd.Series:
        def sh(text):
            if text is None:
                return 0
            toks = _py_tokens(text)
            if not toks:
                return 0
            hs = np.array([_py_poly_hash(t) for t in toks], dtype=np.int64)
            bits_mat = (hs[:, None] & bit_vals[None, :]) != 0
            votes = np.where(bits_mat, 1, -1).sum(axis=0)
            return int((bit_vals * (votes > 0)).sum())

        return s.map(sh)

    return _sh


def poly_hash(col: Column) -> Column:
    """H(s) — Arrow-batched vectorized UDF (hot path)."""
    return _cached("poly", _make_poly_hash_udf)(col)


def shingles_text(col: Column, n: int = 3) -> Column:
    """text → distinct n-word shingles, single pass (the Catalyst
    higher-order-function formulation re-tokenizes per shingle element —
    O(tokens²) regex splits; this is O(tokens))."""
    return _cached(f"shingles{n}", lambda: _make_shingles_udf(n))(col)


def minhash_sig_text(col: Column, k: int = 16, n: int = 3) -> Column:
    """text → k-value minhash signature, single pass."""
    return _cached(f"mh_text{k}_{n}", lambda: _make_minhash_text_udf(k, n))(col)


def simhash_text(col: Column, bits: int = 32) -> Column:
    """text → SimHash, single pass."""
    return _cached(f"sh_text{bits}", lambda: _make_simhash_text_udf(bits))(col)


def shingle_profile(col: Column, k: int = 16, n: int = 3) -> Column:
    """text → struct(hashes, sig) in one vectorized pass."""
    return _cached(f"prof{k}_{n}", lambda: _make_shingle_profile_udf(k, n))(col)


def _make_char_ngram_bottomk_udf(n: int, k: int):
    """Bottom-k sketch over character n-gram hashes of the normalized
    text: the k smallest distinct hashes — an unbiased Jaccard sketch
    (KMV) that needs no permutations."""

    @F.pandas_udf("array<long>")
    def _b(s: pd.Series) -> pd.Series:
        def sketch(text):
            if text is None:
                return None
            norm = " ".join(_py_tokens(text))
            if len(norm) < n:
                grams = [norm] if norm else []
            else:
                grams = [norm[i : i + n] for i in range(len(norm) - n + 1)]
            hs = sorted({_py_poly_hash(g) for g in grams})
            return hs[:k]

        return s.map(sketch)

    return _b


def char_ngram_bottomk(col: Column, n: int = 5, k: int = 8) -> Column:
    return _cached(f"cng{n}_{k}", lambda: _make_char_ngram_bottomk_udf(n, k))(col)


def sql_char_ngram_bottomk(text_expr: str, n: int = 5, k: int = 8) -> str:
    """DuckDB twin: normalized text → distinct char n-gram hashes →
    k smallest."""
    norm = f"array_to_string({sql_tokens(text_expr)}, ' ')"
    grams = (
        f"(SELECT CASE WHEN length(__t) < {n} THEN "
        f"CASE WHEN __t = '' THEN [] ELSE [__t] END "
        f"ELSE [substr(__t, i, {n}) for i in generate_series(1, length(__t) - {n - 1})] END "
        f"FROM (SELECT {norm} AS __t) __g)"
    )
    return (
        f"list_sort(list_distinct([{sql_poly_hash('g')} for g in {grams}]))[1:{k}]"
    )


def poly_hash_array(arr: Column) -> Column:
    """Element-wise H over an array<string> column."""
    return _cached("poly_arr", _make_poly_hash_array_udf)(arr)


def simhash_from_tokens(toks: Column, bits: int = 32) -> Column:
    """SimHash (bit votes over token hashes, with multiplicity) — one
    vectorized UDF, no explode/shuffle."""
    return _cached(f"simhash{bits}", lambda: _make_simhash_udf(bits))(toks)


# ---- column-expression reference implementations (parity-tested) ----


def poly_hash_expr(col: Column) -> Column:
    """H(s) as a pure Catalyst expression (slow; reference only)."""
    chars = F.filter(F.split(col, ""), lambda c: c != F.lit(""))
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * POLY_MULT + F.ascii(c)) % POLY_MOD,
    )


def tokens(col: Column) -> Column:
    """Lowercased whitespace tokens, empties removed — the shared
    tokenizer for every text operator.

    ``array_remove(..., '')`` instead of the lambda-HOF
    ``filter(..., t -> t != '')``: identical output (both drop exactly
    the empty strings a leading/trailing-whitespace split produces),
    but array_remove is a plain unary expression while a lambda HOF is
    evaluated interpreted per element — measured ~2x on the tokenize
    stage of every token-path operator (r13 §tokens)."""
    return F.array_remove(F.split(F.lower(col), r"\s+"), "")


# --------------------------------------------------------------------------
# DuckDB side (SQL fragment builders — MUST mirror the Spark expressions)
# --------------------------------------------------------------------------


def sql_poly_hash(expr: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"[CAST(ascii(c) AS BIGINT) for c in string_split({expr}, '') if c <> '']), "
        f"(acc, c) -> (acc * {POLY_MULT} + c) % {POLY_MOD})"
    )


def sql_tokens(expr: str) -> str:
    return f"[t for t in string_split_regex(lower({expr}), '\\s+') if t <> '']"


def sql_token_hashes(toks_expr: str) -> str:
    return f"[{sql_poly_hash('t')} for t in {toks_expr}]"


def sql_shingle_hashes(th_col: str, n: int = 3) -> str:
    """DuckDB twin of _py_shingle_hashes over a token-hash list column."""
    expr = f"{th_col}[i]"
    for j in range(1, n):
        expr = f"(({expr}) * {POLY_MULT} + {th_col}[i+{j}]) % {POLY_MOD}"
    fold = (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), {th_col}), "
        f"(acc, h) -> (acc * {POLY_MULT} + h) % {POLY_MOD})"
    )
    return (
        f"list_distinct(CASE WHEN len({th_col}) >= {n} THEN "
        f"[{expr} for i in generate_series(1, len({th_col}) - {n - 1})] "
        f"ELSE [{fold}] END)"
    )


