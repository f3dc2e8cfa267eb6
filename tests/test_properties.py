"""Property-based tests (hypothesis) for the pure planning/model logic —
the reference has no property testing (SURVEY §5); these guard the
invariants the distributed operators rely on."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from flink_cdc_2_3_0_src_spark.functions.hashing import (
    _py_poly_hash,
    _py_shingles,
    minhash_params,
    MERSENNE_P,
)
from flink_cdc_2_3_0_src_spark.model import BinlogOffset, ChunkRange
from flink_cdc_2_3_0_src_spark.plans.chunking import (
    ChunkPlanner,
    TableAnalysis,
    calculate_distribution_factor,
    split_evenly_sized_chunks,
)
from flink_cdc_2_3_0_src_spark.model import TableId


@given(
    keys=st.lists(st.integers(min_value=-(10**9), max_value=10**9),
                  min_size=1, max_size=300, unique=True),
    chunk_size=st.integers(min_value=1, max_value=50),
)
@settings(max_examples=200, deadline=None)
def test_even_chunks_tile_exactly(keys, chunk_size):
    keys = sorted(keys)
    factor = calculate_distribution_factor(keys[0], keys[-1], len(keys))
    chunks = split_evenly_sized_chunks(
        keys[0], keys[-1], len(keys), chunk_size, factor
    )
    # unbounded edges
    assert chunks[0].start is None and chunks[-1].end is None
    # adjacent ranges share boundaries (no gaps, no overlaps)
    for a, b in zip(chunks, chunks[1:]):
        assert a.end == b.start
    # every key lands in exactly one chunk
    for k in keys:
        assert sum(1 for c in chunks if c.contains(k)) == 1


@given(
    keys=st.lists(st.integers(min_value=0, max_value=10**6),
                  min_size=1, max_size=200, unique=True),
    chunk_size=st.integers(min_value=1, max_value=20),
)
@settings(max_examples=100, deadline=None)
def test_uneven_chunks_tile_exactly(keys, chunk_size):
    keys = sorted(keys)

    def next_max(low):
        window = [k for k in keys if k >= low][:chunk_size]
        return window[-1] if window else None

    p = ChunkPlanner(
        TableId(None, None, "t"), "k",
        analyze=lambda: TableAnalysis(keys[0], keys[-1], len(keys), numeric=True),
        query_next_chunk_max=next_max,
        chunk_size=chunk_size,
        dist_factor_lower=2.0,  # force uneven path
        dist_factor_upper=1.0,
    )
    chunks = list(p.plan())
    assert chunks[0].start is None and chunks[-1].end is None
    for k in keys:
        assert sum(1 for c in chunks if c.contains(k)) == 1


_offsets = st.builds(
    BinlogOffset,
    file=st.sampled_from(["", "bin.000001", "bin.000002", "bin.000010"]),
    pos=st.integers(min_value=0, max_value=10**6),
    skip_events=st.integers(min_value=0, max_value=5),
)


@given(a=_offsets, b=_offsets, c=_offsets)
@settings(max_examples=300, deadline=None)
def test_offset_total_order_properties(a, b, c):
    # totality
    assert (a <= b) or (b <= a)
    # antisymmetry
    if a <= b and b <= a:
        assert a._cmp_key() == b._cmp_key()
    # transitivity
    if a <= b and b <= c:
        assert a <= c


@given(text=st.text(alphabet=st.characters(codec="utf-8"), max_size=200))
@settings(max_examples=300, deadline=None)
def test_poly_hash_in_range_and_deterministic(text):
    h = _py_poly_hash(text)
    assert 0 <= h < 1_000_000_007
    assert h == _py_poly_hash(text)


@given(
    words=st.lists(st.text(alphabet="abcdefg", min_size=1, max_size=5),
                   min_size=0, max_size=50),
    n=st.integers(min_value=2, max_value=5),
)
@settings(max_examples=200, deadline=None)
def test_shingles_properties(words, n):
    text = " ".join(words)
    sh = _py_shingles(text, n)
    # always at least one shingle; all distinct
    assert len(sh) >= 1
    assert len(set(sh)) == len(sh)
    toks = [w.lower() for w in words if w]
    if len(toks) >= n:
        # every shingle is n consecutive tokens
        assert all(len(s.split(" ")) == n for s in sh)
        assert len(sh) <= len(toks) - n + 1
    # shingling is idempotent w.r.t. whitespace normalization
    assert _py_shingles("  " + text + "  ", n) == sh


@given(
    texts=st.lists(
        st.text(alphabet=st.characters(codec="utf-8", exclude_characters="'\x00"),
                max_size=80),
        min_size=1, max_size=50,
    )
)
@settings(max_examples=30, deadline=None)
def test_poly_hash_cross_engine_fuzz(texts):
    """The hash contract itself, fuzzed across engines: python reference
    (used by every pandas UDF) == DuckDB sql_poly_hash (used by every
    oracle) on arbitrary unicode strings."""
    import duckdb

    from flink_cdc_2_3_0_src_spark.functions.hashing import sql_poly_hash

    con = duckdb.connect()
    got = [
        con.execute(f"SELECT {sql_poly_hash('?::VARCHAR')}", [t]).fetchone()[0]
        for t in texts
    ]
    ref = [_py_poly_hash(t) for t in texts]
    assert got == ref


def test_minhash_params_fixed():
    """The (a, b) constants are part of the cross-engine contract — they
    must never drift (oracle SQL embeds them as literals)."""
    p16 = minhash_params(16)
    assert len(set(p16)) == 16
    assert all(1 <= a < MERSENNE_P and 0 <= b < MERSENNE_P for a, b in p16)
    # prefix stability: params(k) is a prefix of params(k+m)
    assert minhash_params(8) == p16[:8]
    # regression pin of the first pair
    assert p16[0] == minhash_params(1)[0]


@settings(max_examples=60, deadline=None)
@given(
    vals=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)), min_size=1, max_size=40
    ),
    bounds=st.tuples(
        st.one_of(st.none(), st.tuples(st.integers(0, 30), st.integers(0, 30))),
        st.one_of(st.none(), st.tuples(st.integers(0, 30), st.integers(0, 30))),
    ),
)
def test_composite_chunkrange_predicate_matches_contains(vals, bounds):
    """For composite keys, the SQL lexicographic predicate and the
    Python contains() check MUST classify every tuple identically —
    this is the consistency A9's stream filter relies on (an event
    routed by contains() must be the same set a chunk SELECT scanned)."""
    import duckdb

    start, end = bounds
    rng = ChunkRange(start, end)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (k1 BIGINT, k2 BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", vals)
    pred = rng.predicate_sql(["k1", "k2"])
    got = set(
        map(tuple, con.execute(f"SELECT k1, k2 FROM t WHERE {pred}").fetchall())
    )
    expect = {v for v in vals if rng.contains(v)}
    assert got == expect


# ---- compaction planner (plans/compaction.py) ----

from flink_cdc_2_3_0_src_spark.plans.compaction import plan_compaction


@given(
    sizes=st.lists(st.integers(min_value=1, max_value=500), min_size=0, max_size=80),
    target=st.integers(min_value=1, max_value=600),
)
@settings(max_examples=200, deadline=None)
def test_compaction_plan_invariants(sizes, target):
    files = {f"f{i:03d}": s for i, s in enumerate(sizes)}
    plan = plan_compaction(files, target)
    # conservation: every file appears exactly once
    seen = list(plan.untouched) + [f for b in plan.bins for f in b.files]
    assert sorted(seen) == sorted(files)
    # bins respect the target and have >= 2 inputs
    for b in plan.bins:
        assert b.total_bytes == sum(files[f] for f in b.files)
        assert b.total_bytes <= target
        assert len(b.files) >= 2
    # oversized files are never rewritten
    for f, s in files.items():
        if s >= target:
            assert f in plan.untouched
    # compaction never increases file count
    assert plan.files_after <= plan.files_before
    # determinism
    again = plan_compaction(files, target)
    assert again.bins == plan.bins and again.untouched == plan.untouched


# --- r5 surfaces -----------------------------------------------------


@given(
    s=st.integers(min_value=0, max_value=2**32 - 1),
    i=st.integers(min_value=0, max_value=2**32 - 1),
    tail=st.binary(max_size=24),
)
@settings(max_examples=200, deadline=None)
def test_resume_token_roundtrip_property(s, i, tail):
    from flink_cdc_2_3_0_src_spark.sources.mongo import (
        ChangeStreamOffset,
        decode_resume_token,
        encode_resume_token,
    )

    tok = encode_resume_token(s, i, suffix=tail)
    assert decode_resume_token(tok) == (s, i)
    off = ChangeStreamOffset.from_resume_token(tok)
    assert (off.seconds, off.increment) == (s, i)


@given(
    hi=st.integers(min_value=0, max_value=2**32 - 1),
    lo=st.integers(min_value=0, max_value=2**32 - 1),
)
@settings(max_examples=200, deadline=None)
def test_pg_lsn_roundtrip_property(hi, lo):
    from flink_cdc_2_3_0_src_spark.sources.postgres import (
        format_pg_lsn,
        parse_pg_lsn,
    )

    v = (hi << 32) | lo
    assert parse_pg_lsn(format_pg_lsn(v)) == v
    assert parse_pg_lsn(f"{hi:X}/{lo:X}") == v


@given(
    value=st.one_of(
        st.integers(min_value=-10**12, max_value=10**12).map(str),
        st.text(
            alphabet=st.characters(
                blacklist_characters="'\"\\", blacklist_categories=("Cs", "Cc")
            ),
            max_size=20,
        ),
    ),
    comment=st.text(
        alphabet=st.characters(
            blacklist_characters="'\"\\", blacklist_categories=("Cs", "Cc")
        ),
        max_size=30,
    ),
)
@settings(max_examples=200, deadline=None)
def test_parse_default_property(value, comment):
    """For ANY default literal and ANY comment text (quotes excluded —
    they terminate the literal), the parsed default is the declared one
    and the comment never leaks into it."""
    from flink_cdc_2_3_0_src_spark.streaming.table_changes import _parse_default

    # ASCII digits only: Python's isdigit() accepts Unicode digits like
    # '²', which MySQL would not lex as a bare numeric literal — those
    # must take the quoted-string branch
    stripped = value.lstrip("-")
    is_num = stripped.isascii() and stripped.isdigit()
    lit = value if is_num else "'" + value.replace("'", "''") + "'"
    rest = f" NOT NULL DEFAULT {lit} COMMENT '{comment}'"
    got = _parse_default(rest)
    assert got == value
    # no DEFAULT clause at all -> None, whatever the comment says
    assert _parse_default(f" NOT NULL COMMENT '{comment}'") is None


@given(data=st.binary(max_size=64))
@settings(max_examples=300, deadline=None)
def test_probe_container_never_raises(data):
    """Total function over arbitrary bytes: the 100 TB scan must not
    die on any payload."""
    from flink_cdc_2_3_0_src_spark.operators.multimodal import probe_container

    out = probe_container(data)
    assert out["format"] in ("unknown", "png", "jpeg", "gif", "bmp", "wav")


@given(
    text=st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80
    )
)
@settings(max_examples=200, deadline=None)
def test_charset_utf8_roundtrip_property(text):
    """Python-side contract check of the codec tables: for every mapped
    Python-codec charset that can encode the text, the decode of those
    bytes is a FIXED POINT (re-encoding reproduces the bytes).  Exact
    x-round-trip would be too strong: legacy CJK codecs are not
    injective (e.g. ¢ and ￠ share a big5 byte sequence), and the
    decode side — the only direction the engine runs — is what must be
    stable."""
    from flink_cdc_2_3_0_src_spark.functions.converters import _PY_CODECS

    for codec in set(_PY_CODECS.values()):
        try:
            enc = text.encode(codec)
        except (UnicodeEncodeError, ValueError):
            continue
        dec = enc.decode(codec)
        assert dec.encode(codec) == enc, codec


@given(ws=st.lists(st.integers(min_value=0, max_value=(1 << 26) - 1),
                   min_size=1, max_size=200))
@settings(max_examples=30, deadline=None)
def test_hll_contribution_cross_engine_fuzz(ws):
    """The HLL register contribution 2^bitlen(w): the numpy frexp path
    (Spark-side Arrow UDF) must equal the DuckDB integer CASE chain for
    every 25-bit w — the cross-engine determinism the oracle relies on."""
    import duckdb
    import numpy as np

    from flink_cdc_2_3_0_src_spark.operators.sketch import _sql_hll_contrib

    arr = np.array(ws, dtype=np.int64)
    _, e = np.frexp(arr.astype(np.float64))
    spark_side = [int(x) for x in np.left_shift(np.int64(1), e.astype(np.int64))]
    py_side = [1 << w.bit_length() if w > 0 else 1 for w in ws]
    assert spark_side == py_side
    con = duckdb.connect()
    # the CASE chain references w many times: bind it once via a CTE
    duck_side = [
        con.execute(
            f"SELECT {_sql_hll_contrib('w')} FROM (SELECT ?::BIGINT AS w)", [w]
        ).fetchone()[0]
        for w in ws
    ]
    assert duck_side == py_side


@given(pairs=st.lists(
    st.tuples(st.integers(min_value=0, max_value=1 << 22),   # weight
              st.integers(min_value=1, max_value=2_147_483_647)),  # u
    min_size=2, max_size=100))
@settings(max_examples=30, deadline=None)
def test_priority_key_floor_preserves_rational_order(pairs):
    """floor(w*P/u) may only reorder pairs whose exact rational
    priorities w*P/u fall in the same unit interval; with the doc_id
    tie-break this keeps cross-engine selection deterministic.  Fuzz:
    whenever two integer keys DIFFER, their order matches the exact
    Fraction order."""
    from fractions import Fraction

    P = 2_147_483_647
    keys = [(w * P) // u for w, u in pairs]
    fracs = [Fraction(w * P, u) for w, u in pairs]
    for i in range(len(pairs)):
        for j in range(len(pairs)):
            if keys[i] > keys[j]:
                assert fracs[i] > fracs[j]


@given(hs=st.lists(st.integers(min_value=0, max_value=(1 << 32) - 1),
                   min_size=1, max_size=100))
@settings(max_examples=30, deadline=None)
def test_fmix32_cross_engine_fuzz(hs):
    """The HLL mixing function (Murmur3 fmix32 via overflow-free
    16-bit-split multiplies): numpy == pure Python == the DuckDB CTE
    pipeline embedded in hll_distinct_sql, over the full 32-bit domain."""
    import duckdb
    import numpy as np

    from flink_cdc_2_3_0_src_spark.operators.sketch import (
        _FMIX_C1, _FMIX_C2, _M32, _np_fmix32, _sql_mulmod32)

    def py_fmix(h):
        h &= _M32
        h ^= h >> 16
        h = ((h & 0xFFFF) * _FMIX_C1 + (((h >> 16) * _FMIX_C1 & _M32) << 16)) & _M32
        h ^= h >> 13
        h = ((h & 0xFFFF) * _FMIX_C2 + (((h >> 16) * _FMIX_C2 & _M32) << 16)) & _M32
        return h ^ (h >> 16)

    ref = [py_fmix(h) for h in hs]
    got_np = [int(x) for x in _np_fmix32(np.array(hs, dtype=np.int64))]
    assert got_np == ref

    con = duckdb.connect()
    # the same staged pipeline hll_distinct_sql embeds
    q = f"""WITH f0 AS (SELECT ?::BIGINT AS h),
    f1 AS (SELECT xor(h, h >> 16) AS h FROM f0),
    f2 AS (SELECT {_sql_mulmod32('h', _FMIX_C1)} AS h FROM f1),
    f3 AS (SELECT xor(h, h >> 13) AS h FROM f2),
    f4 AS (SELECT {_sql_mulmod32('h', _FMIX_C2)} AS h FROM f3)
    SELECT xor(h, h >> 16) FROM f4"""
    got_sql = [con.execute(q, [h]).fetchone()[0] for h in hs]
    assert got_sql == ref


@given(
    docs=st.lists(
        st.tuples(st.integers(min_value=0, max_value=1 << 34),  # doc_id
                  st.integers(min_value=0, max_value=50)),      # token count
        min_size=1, max_size=60, unique_by=lambda t: t[0],
    ),
    k=st.integers(min_value=1, max_value=12),
)
@settings(max_examples=25, deadline=None)
def test_priority_sample_sql_vs_python_brute_force(docs, k):
    """The DuckDB oracle of pipeline_priority_sample, fuzzed against a
    from-scratch Python implementation of DLT priority sampling on
    random corpora (random ids incl. >2^33, random weights, corpus
    sizes straddling k)."""
    import duckdb

    from flink_cdc_2_3_0_src_spark.operators.sampling import priority_sample_sql

    P = 2_147_483_647
    A1, B1, A2, B2 = 1_103_515_245, 12_345, 69_069, 1_234_567

    def u_of(d):
        return ((A2 * ((A1 * (d % P) + B1) % P) + B2) % P) + 1

    ranked = sorted(
        ((w * P) // u_of(d), d, w) for d, w in docs
    )
    ranked = [(d, w, key) for key, d, w in
              sorted(((k_, d, w) for (k_, d, w) in ranked),
                     key=lambda t: (-t[0], t[1]))]
    tau = ranked[k][2] if len(ranked) > k else 0
    want = [(d, "s", w, key, i + 1, max(w, tau))
            for i, (d, w, key) in enumerate(ranked[:k])]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({d}, '{' '.join('t' for _ in range(w))}', 's')"
            for d, w in docs
        )
        + ") v(doc_id, text, source)"
    )
    got = [tuple(r) for r in con.execute(priority_sample_sql(k)).fetchall()]
    assert got == want


@given(
    toks=st.lists(st.text(alphabet="abcxyz01", min_size=1, max_size=6),
                  min_size=1, max_size=120),
)
@settings(max_examples=25, deadline=None)
def test_hll_sql_vs_python_reference(toks):
    """The DuckDB oracle of sketch_hll_distinct, fuzzed against a
    from-scratch Python HLL (poly hash -> fmix32 -> registers ->
    integer estimate) on random token corpora."""
    import duckdb

    from flink_cdc_2_3_0_src_spark.operators.sketch import hll_distinct_sql, hll_params

    pr = hll_params(64)
    M32 = 0xFFFFFFFF

    def fmix(h):
        h &= M32
        h ^= h >> 16
        h = ((h & 0xFFFF) * 0x85EBCA6B + (((h >> 16) * 0x85EBCA6B & M32) << 16)) & M32
        h ^= h >> 13
        h = ((h & 0xFFFF) * 0xC2B2AE35 + (((h >> 16) * 0xC2B2AE35 & M32) << 16)) & M32
        return h ^ (h >> 16)

    hs = {_py_poly_hash(t.lower()) for t in toks}
    regs = [pr.empty] * pr.m
    for h in hs:
        h2 = fmix(h)
        idx = h2 & (pr.m - 1)
        w = h2 >> pr.p
        c = 1 << w.bit_length() if w > 0 else 1
        regs[idx] = min(regs[idx], c)
    S = sum(regs)
    V = sum(1 for x in regs if x == pr.empty)
    raw = pr.num // (pr.den * S)
    est = pr.linear[V - 1] if V > 0 and raw <= pr.small else raw
    want = [("s", V, S, est)]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}', 's')" for i, t in enumerate(toks))
        + ") v(doc_id, text, source)"
    )
    got = [tuple(r) for r in con.execute(hll_distinct_sql()).fetchall()]
    assert got == want


# ---- incremental delta-join vs a from-scratch Python reference (r8) ----

_dj_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),            # key
        st.integers(min_value=0, max_value=9),            # value
        st.booleans(),                                    # True = upsert, False = delete
    ),
    min_size=0,
    max_size=14,
)


def _py_materialize(events):
    """Pure-Python replay of an upsert log: final live image per key."""
    live = {}
    for k, v, is_upsert in events:
        if is_upsert:
            live[k] = v
        else:
            live.pop(k, None)
    return live


def _mk_upsert_log(spark, events, val_col):
    from flink_cdc_2_3_0_src_spark.model import OP_COL, SEQ_COL

    seen = set()
    rows = []
    for i, (k, v, is_upsert) in enumerate(events):
        if is_upsert:
            op = "+U" if k in seen else "+I"
            seen.add(k)
            rows.append((k, v, op, i + 1))
        else:
            seen.discard(k)
            rows.append((k, v, "-D", i + 1))
    return spark.createDataFrame(
        rows, f"user_id long, {val_col} long, {OP_COL} string, {SEQ_COL} long"
    )


@given(
    ev_a=_dj_events,
    ev_b=_dj_events,
    n_batches=st.integers(1, 5),
    how=st.sampled_from(["inner", "left", "right", "full"]),
)
@settings(max_examples=12, deadline=None)
def test_delta_join_fuzz_vs_python_reference(spark, ev_a, ev_b, n_batches, how):
    """For ARBITRARY pairs of keyed upsert logs, ANY batch split, and
    every join mode, the accumulated delta-join output equals the
    corresponding join of the two replayed final states (computed by an
    independent pure-Python replay) — the bilinearity + padding
    invariant, fuzzed."""
    from flink_cdc_2_3_0_src_spark.model import ChangelogMode
    from flink_cdc_2_3_0_src_spark.operators.changelog import (
        delta_join_changelog,
        ensure_retractions,
    )

    a = ensure_retractions(
        _mk_upsert_log(spark, ev_a, "va"), ChangelogMode.UPSERT, ["user_id"]
    )
    b = ensure_retractions(
        _mk_upsert_log(spark, ev_b, "vb"), ChangelogMode.UPSERT, ["user_id"]
    )
    def key(t):
        return tuple((x is None, x) for x in t)

    got = sorted(
        (tuple(r) for r in delta_join_changelog(
            a, b, ["user_id"], n_batches=n_batches, how=how
        ).collect()),
        key=key,
    )
    la, lb = _py_materialize(ev_a), _py_materialize(ev_b)
    if how == "inner":
        keys = la.keys() & lb.keys()
    elif how == "left":
        keys = la.keys()
    elif how == "right":
        keys = lb.keys()
    else:
        keys = la.keys() | lb.keys()
    want = sorted(
        ((k, la.get(k), lb.get(k)) for k in keys), key=key
    )
    assert got == want
