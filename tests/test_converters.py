"""Unit tests for the §1.4 runtime converter matrix
(functions/converters.py): the four decimal.handling.mode encodings,
SET→array, and WKB geometry→GeoJSON — reference
RowDataDebeziumDeserializeSchema.java:555-587 and
MySqlDeserializationConverterFactory.java:68-148."""

from __future__ import annotations

import base64
import json
import struct
from decimal import Decimal

from pyspark.sql import functions as F

from flink_cdc_2_3_0_src_spark.functions import converters as C


def _b64(v: int, nbytes: int | None = None) -> str:
    n = nbytes or max((v.bit_length() + 8) // 8, 1)
    return base64.b64encode(v.to_bytes(n, "big", signed=True)).decode()


def test_connect_decimal_precise_values(spark):
    cases = [
        (1557150, 2, Decimal("15571.50")),
        (-1557150, 2, Decimal("-15571.50")),
        (0, 2, Decimal("0.00")),
        (-1, 2, Decimal("-0.01")),
        (127, 2, Decimal("1.27")),
        (-128, 2, Decimal("-1.28")),  # sign-bit boundary bytes
        (255, 2, Decimal("2.55")),  # needs the 00-prefix byte
    ]
    df = spark.createDataFrame([(_b64(v),) for v, _, _ in cases], "b string")
    got = df.select(C.connect_decimal_precise(F.col("b"), 12, 2).alias("d")).collect()
    assert [r["d"] for r in got] == [e for _, _, e in cases]


def test_connect_decimal_precise_wide_and_padded(spark):
    # 35 significant digits and NON-minimal (padded) byte encodings —
    # both legal Connect Decimal forms
    v = 12345678901234567890123456789012345
    rows = [(_b64(v),), (_b64(-v),), (_b64(123, nbytes=8),), (_b64(-123, nbytes=8),)]
    df = spark.createDataFrame(rows, "b string")
    got = [
        r["d"]
        for r in df.select(
            C.connect_decimal_precise(F.col("b"), 38, 2).alias("d")
        ).collect()
    ]
    assert got == [
        Decimal("123456789012345678901234567890123.45"),
        Decimal("-123456789012345678901234567890123.45"),
        Decimal("1.23"),
        Decimal("-1.23"),
    ]


def test_connect_decimal_precise_16_byte_and_beyond(spark):
    # 16-byte minimal encodings (legal for precision 37-38) and
    # heavily sign-extension-padded encodings of both signs
    v = 10**36
    rows = [
        (_b64(-v),),            # needs 16 bytes minimal
        (_b64(v),),
        (_b64(-v, nbytes=20),),  # FF-padded beyond the chunk width
        (_b64(v, nbytes=20),),
    ]
    df = spark.createDataFrame(rows, "b string")
    got = [
        str(r["d"])
        for r in df.select(
            C.connect_decimal_precise(F.col("b"), 38, 0).alias("d")
        ).collect()
    ]
    assert got == [str(-v), str(v), str(-v), str(v)]


def test_variable_scale_decimal_negative_scale(spark):
    # Oracle NUMBER(p, s<0): scale -2 multiplies up by 100
    rows = [((-2, _b64(5)),), ((-3, _b64(-7)),)]
    df = spark.createDataFrame(rows, "vs struct<scale:int, value:string>")
    got = [
        str(r["d"])
        for r in df.select(
            C.variable_scale_decimal(F.col("vs"), 18, 0).alias("d")
        ).collect()
    ]
    assert got == ["500", "-7000"]


def test_connect_decimal_string_and_double(spark):
    df = spark.createDataFrame([("123.45", 123.45)], "s string, d double")
    row = df.select(
        C.connect_decimal_string(F.col("s"), 12, 2).alias("a"),
        C.connect_decimal_double(F.col("d"), 12, 2).alias("b"),
    ).collect()[0]
    assert row["a"] == Decimal("123.45")
    assert row["b"] == Decimal("123.45")


def test_variable_scale_decimal_per_row_scale(spark):
    # same unscaled value, four different row-level scales
    rows = [((k, _b64(12345)),) for k in range(4)]
    df = spark.createDataFrame(rows, "vs struct<scale:int, value:string>")
    got = [
        str(r["d"])
        for r in df.select(
            C.variable_scale_decimal(F.col("vs"), 18, 4).alias("d")
        ).collect()
    ]
    assert got == ["12345.0000", "1234.5000", "123.4500", "12.3450"]


def test_variable_scale_decimal_negative_and_small(spark):
    rows = [((3, _b64(-7)),), ((0, _b64(-7)),)]
    df = spark.createDataFrame(rows, "vs struct<scale:int, value:string>")
    got = [
        str(r["d"])
        for r in df.select(
            C.variable_scale_decimal(F.col("vs"), 18, 4).alias("d")
        ).collect()
    ]
    assert got == ["-0.0070", "-7.0000"]


def test_mysql_set_to_array(spark):
    df = spark.createDataFrame(
        [("a,b,c",), ("solo",), ("",), (None,)], "s string"
    )
    got = [
        r["a"] for r in df.select(C.mysql_set_to_array(F.col("s")).alias("a")).collect()
    ]
    assert got == [["a", "b", "c"], ["solo"], [], None]  # NULL stays NULL


def _geo_df(spark, wkb: bytes, srid: int = 4326):
    return spark.createDataFrame(
        [((base64.b64encode(wkb).decode(), srid),)],
        "g struct<wkb:string, srid:int>",
    )


def _decode(spark, wkb: bytes, srid: int = 4326):
    row = (
        _geo_df(spark, wkb, srid)
        .select(C.geometry_to_geojson(F.col("g")).alias("j"))
        .collect()[0]
    )
    return json.loads(row["j"])


def test_geometry_point_little_and_big_endian(spark):
    le = struct.pack("<BIdd", 1, 1, -179.5, 42.25)
    be = struct.pack(">BIdd", 0, 1, -179.5, 42.25)
    for wkb in (le, be):
        g = _decode(spark, wkb)
        assert g == {"type": "Point", "coordinates": [-179.5, 42.25], "srid": 4326}


def test_geometry_linestring_polygon_and_ewkb(spark):
    ls = struct.pack("<BII", 1, 2, 2) + struct.pack("<dddd", 0.0, 0.0, 1.5, 2.5)
    g = _decode(spark, ls)
    assert g["type"] == "LineString"
    assert g["coordinates"] == [[0.0, 0.0], [1.5, 2.5]]

    ring = struct.pack("<I", 4) + struct.pack(
        "<" + "d" * 8, 0, 0, 1, 0, 1, 1, 0, 0
    )
    poly = struct.pack("<BII", 1, 3, 1) + ring
    g = _decode(spark, poly)
    assert g["type"] == "Polygon"
    assert g["coordinates"][0][0] == [0.0, 0.0]

    # EWKB: srid flag bit + embedded srid dword before the coordinates
    ewkb_pt = struct.pack("<BIIdd", 1, 1 | 0x20000000, 3857, 7.5, -8.25)
    g = _decode(spark, ewkb_pt, srid=3857)
    assert g == {"type": "Point", "coordinates": [7.5, -8.25], "srid": 3857}


def test_geometry_unsupported_type_carries_hex(spark):
    # geometry collection (type 7): not parsed — raw hex carried, srid kept
    wkb = struct.pack("<BII", 1, 7, 0)
    g = _decode(spark, wkb, srid=0)
    assert g["type"] == "Geometry"
    assert g["wkb_hex"] == wkb.hex().upper()
    assert g["srid"] == 0


def test_from_debezium_json_converters_hook(spark):
    """Envelope decode end-to-end with a converters map (the reference's
    per-column DeserializationRuntimeConverter seam)."""
    from pyspark.sql import types as T

    from flink_cdc_2_3_0_src_spark.functions.debezium import from_debezium_json

    env = json.dumps(
        {
            "after": {"id": 1, "amount": _b64(999)},
            "source": {"db": "d", "table": "t"},
            "op": "c",
            "ts_ms": 1,
        }
    )
    df = spark.createDataFrame([(env,)], "value string")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("amount", T.StringType())]
    )
    out = from_debezium_json(
        df,
        schema,
        converters={"amount": lambda c: C.connect_decimal_precise(c, 10, 2)},
    ).collect()
    assert len(out) == 1
    assert out[0]["amount"] == Decimal("9.99")
    assert out[0]["_op"] == "+I"


def test_bson_scalar_converters(spark):
    """Extended-JSON v2 BSON wrappers → logical values (reference
    MongoDBConnectorDeserializationSchema.java:274-530)."""
    from pyspark.sql import types as T

    doc = json.dumps(
        {
            "_id": {"$oid": "64A1B2C3D4E5F60718293A4B"},
            "amt": {"$numberDecimal": "99.90"},
            "created": {"$date": {"$numberLong": "907372800123"}},
            "sync": {"$timestamp": {"t": 907372800, "i": 5}},
            "pat": {"$regularExpression": {"pattern": "^a.*b$", "options": "im"}},
            "lo": {"$minKey": 1},
            "hi": {"$maxKey": 1},
            "bin": {"$binary": {"base64": base64.b64encode(b"abc").decode(), "subType": "00"}},
            "n": {"$numberLong": "-42"},
        }
    )
    schema = T.StructType(
        [
            T.StructField("_id", C.bson_object_id_schema()),
            T.StructField("amt", C.bson_decimal128_schema()),
            T.StructField("created", C.bson_date_schema()),
            T.StructField("sync", C.bson_timestamp_schema()),
            T.StructField("pat", C.bson_regex_schema()),
            T.StructField("lo", C.bson_min_max_key_schema()),
            T.StructField("hi", C.bson_min_max_key_schema()),
            T.StructField("bin", C.bson_binary_schema()),
            T.StructField("n", C.bson_long_schema()),
        ]
    )
    df = spark.createDataFrame([(doc,)], "j string").select(
        F.from_json("j", schema).alias("d")
    )
    row = df.select(
        C.bson_object_id(F.col("d._id")).alias("oid"),
        C.bson_decimal128(F.col("d.amt"), 10, 2).alias("amt"),
        C.bson_date_millis(F.col("d.created")).alias("created"),
        C.bson_timestamp_millis(F.col("d.sync")).alias("sync"),
        C.bson_regex(F.col("d.pat")).alias("pat"),
        C.bson_min_max_key(F.col("d.lo")).alias("lo"),
        C.bson_min_max_key(F.col("d.hi")).alias("hi"),
        C.bson_binary(F.col("d.bin")).alias("bin"),
        C.bson_long(F.col("d.n")).alias("n"),
    ).collect()[0]
    assert row["oid"] == "64a1b2c3d4e5f60718293a4b"
    assert row["amt"] == Decimal("99.90")
    assert row["created"] == 907372800123
    assert row["sync"] == 907372800000
    assert row["pat"] == "/^a.*b$/im"
    assert row["lo"] == "MinKey"
    assert row["hi"] == "MaxKey"
    assert bytes(row["bin"]) == b"abc"
    assert row["n"] == -42


def test_connect_decimal_precise_randomized_roundtrip(spark):
    """Seeded random (value, scale, padding) cases through the
    Connect-Decimal encode (Python reference: BigInteger.toByteArray
    semantics) and the JVM decode, batched into TWO Spark jobs (one per
    target type).  Covers up to 26 significant digits with scales 0..10
    against decimal(38,10), plus every +/-2^k and sign-bit byte
    boundary up to 2^120 against decimal(38,2), with minimal and
    sign-extension-padded encodings of both signs."""
    import random

    rng = random.Random(20260814)
    rand_cases = []
    for _ in range(380):
        digits = rng.randint(1, 26)
        v = rng.randint(0, 10**digits - 1)
        if rng.random() < 0.5:
            v = -v
        scale = rng.randint(0, 10)
        nbytes = max((abs(v).bit_length() + 8) // 8, 1)
        if rng.random() < 0.3:
            nbytes += rng.randint(1, 6)  # legal sign-extension padding
        rand_cases.append((v, scale, nbytes))
    bound_cases = []
    for k in (1, 7, 8, 15, 16, 31, 32, 63, 64, 119, 120):
        for v in (2**k - 1, 2**k, -(2**k), -(2**k) - 1):
            bound_cases.append((v, 2, max((abs(v).bit_length() + 8) // 8, 1)))

    from flink_cdc_2_3_0_src_spark.functions.converters import (
        _apply_scale,
        _unscaled_from_binary,
    )

    for cases, out_scale in ((rand_cases, 10), (bound_cases, 2)):
        rows = [(_b64(v, nbytes=n), s) for v, s, n in cases]
        df = spark.createDataFrame(rows, "b string, sc int")
        neg, mag = _unscaled_from_binary(F.unbase64("b"))
        got = [
            r["d"]
            for r in df.select(
                _apply_scale(neg, mag, F.col("sc"), 38, out_scale).alias("d")
            ).collect()
        ]
        import decimal as _dec

        with _dec.localcontext(_dec.Context(prec=60)):
            for (v, s_, n), d in zip(cases, got):
                expect = Decimal(v).scaleb(-s_).quantize(
                    Decimal(1).scaleb(-out_scale)
                )
                assert d == expect, (
                    f"v={v} scale={s_} nbytes={n}: got {d}, want {expect}"
                )


# --- temporal converter matrix (reference RowDataDebeziumDeserializeSchema
# .java:430-553 createDate/Time/Timestamp/LocalTimeZoneTimestamp converters) ---


def test_debezium_date_and_timestamps(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [(19723, 1704164645123, 1704164645123456, 1704164645123456789)],
        "days int, ms bigint, us bigint, ns bigint",
    )
    row = df.select(
        C.debezium_date(F.col("days")).alias("d"),
        C.debezium_timestamp_millis(F.col("ms")).alias("t_ms"),
        C.debezium_timestamp_micros(F.col("us")).alias("t_us"),
        C.debezium_timestamp_nanos(F.col("ns")).alias("t_ns"),
    ).collect()[0]
    assert row["d"] == dt.date(2024, 1, 1)
    # 2024-01-02T03:04:05.123[456] UTC wall clock, tz-free
    assert row["t_ms"] == dt.datetime(2024, 1, 2, 3, 4, 5, 123000)
    assert row["t_us"] == dt.datetime(2024, 1, 2, 3, 4, 5, 123456)
    assert row["t_ns"] == dt.datetime(2024, 1, 2, 3, 4, 5, 123456)


def test_debezium_timestamp_session_tz_independent(spark):
    """The decoded NTZ value must not move with the session timezone."""
    import datetime as dt

    df = spark.createDataFrame([(1704164645123456,)], "us bigint")
    expected = dt.datetime(2024, 1, 2, 3, 4, 5, 123456)
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got = df.select(
                C.debezium_timestamp_micros(F.col("us")).alias("t")
            ).collect()[0]["t"]
            assert got == expected, tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_debezium_pre_epoch_values(spark):
    import datetime as dt

    df = spark.createDataFrame([(-1, -1)], "days int, us bigint")
    row = df.select(
        C.debezium_date(F.col("days")).alias("d"),
        C.micros_to_ntz(F.col("us")).alias("t"),
    ).collect()[0]
    assert row["d"] == dt.date(1969, 12, 31)
    assert row["t"] == dt.datetime(1969, 12, 31, 23, 59, 59, 999999)


def test_zoned_timestamp_server_time_zone(spark):
    """ZonedTimestamp ISO strings re-rendered at serverTimeZone,
    DST-correct: America/New_York is UTC-5 in January, UTC-4 in July."""
    import datetime as dt

    df = spark.createDataFrame(
        [
            ("2024-01-02T03:04:05.123456Z",),
            ("2024-07-02T03:04:05.123456Z",),
            ("2024-01-02T05:04:05+02:00",),  # same instant as 03:04:05Z
        ],
        "z string",
    )
    ny = df.select(C.zoned_timestamp_to_ntz(F.col("z"), "America/New_York").alias("t")).collect()
    assert ny[0]["t"] == dt.datetime(2024, 1, 1, 22, 4, 5, 123456)  # EST -5
    assert ny[1]["t"] == dt.datetime(2024, 7, 1, 23, 4, 5, 123456)  # EDT -4
    assert ny[2]["t"] == dt.datetime(2024, 1, 1, 22, 4, 5)
    utc = df.select(C.zoned_timestamp_to_ntz(F.col("z")).alias("t")).collect()
    assert utc[0]["t"] == dt.datetime(2024, 1, 2, 3, 4, 5, 123456)
    assert utc[2]["t"] == dt.datetime(2024, 1, 2, 3, 4, 5)


def test_debezium_time_of_day(spark):
    df = spark.createDataFrame(
        [(11045123, 11045123456, 11045123456789, 0, 86399999)],
        "ms bigint, us bigint, ns bigint, zero bigint, last_ms bigint",
    )
    row = df.select(
        C.debezium_time_millis(F.col("ms")).alias("ms_s"),
        C.debezium_time_micros(F.col("us")).alias("us_s"),
        C.debezium_time_nanos(F.col("ns")).alias("ns_s"),
        C.debezium_time_millis(F.col("zero")).alias("zero_s"),
        C.debezium_time_millis(F.col("last_ms")).alias("last_s"),
    ).collect()[0]
    assert row["ms_s"] == "03:04:05.123000"
    assert row["us_s"] == "03:04:05.123456"
    assert row["ns_s"] == "03:04:05.123456"
    assert row["zero_s"] == "00:00:00.000000"
    assert row["last_s"] == "23:59:59.999000"


def test_temporal_randomized_roundtrip(spark):
    """Seeded randomized roundtrip: epoch-micros -> micros_to_ntz ->
    Python datetime must equal the datetime the stdlib derives from the
    same micros, across the full practical range (1900-2200, including
    pre-epoch), plus ZonedTimestamp strings rendered from those instants
    at fixed offsets."""
    import datetime as dt
    import random

    rng = random.Random(0xC0FFEE)
    lo = int(dt.datetime(1900, 1, 1).timestamp() * 1_000_000)
    hi = int(dt.datetime(2200, 1, 1).timestamp() * 1_000_000)
    cases = [rng.randrange(lo, hi) for _ in range(200)] + [0, -1, 1]
    df = spark.createDataFrame([(v,) for v in cases], "us bigint")
    got = (
        df.select("us", C.micros_to_ntz(F.col("us")).alias("t"))
        .orderBy("us")
        .collect()
    )
    epoch = dt.datetime(1970, 1, 1)
    for r in got:
        assert r["t"] == epoch + dt.timedelta(microseconds=r["us"]), r["us"]
    # zoned strings with explicit offsets re-rendered at the SAME offset
    # must invert exactly
    zcases = [
        (v, off)
        for v in cases[:50]
        for off in ("+00:00", "+05:30", "-08:00")
    ]
    zrows = []
    for v, off in zcases:
        wall = epoch + dt.timedelta(microseconds=v)
        zrows.append((wall.strftime("%Y-%m-%dT%H:%M:%S.%f") + off, off, v))
    zdf = spark.createDataFrame(zrows, "z string, off string, us bigint")
    for off in ("+00:00", "+05:30", "-08:00"):
        sub = (
            zdf.filter(F.col("off") == off)
            .select("us", C.zoned_timestamp_to_ntz(F.col("z"), off).alias("t"))
            .collect()
        )
        for r in sub:
            assert r["t"] == epoch + dt.timedelta(microseconds=r["us"]), (
                off,
                r["us"],
            )


# --- charset decode (A13 fidelity; MysqlConnectorCharsetITCase) ------


def test_charset_decode_known_bytes(spark):
    """Hand-pinned byte fixtures: latin1 0xE9 -> 'é', gbk C4E3BAC3 ->
    '你好' — a UTF-8 assumption would mojibake or error on both."""
    from flink_cdc_2_3_0_src_spark.functions.converters import charset_decode

    df = spark.createDataFrame(
        [
            (1, bytes([0x63, 0x61, 0x66, 0xE9]), bytes([0xC4, 0xE3, 0xBA, 0xC3])),
            (2, bytes([0xDF]), bytes([0xB2, 0xE2, 0xCA, 0xD4])),
            (3, None, None),
        ],
        "id bigint, lat binary, gbk binary",
    )
    rows = {
        r["id"]: (r["lat_s"], r["gbk_s"])
        for r in df.select(
            "id",
            charset_decode(F.col("lat"), "latin1").alias("lat_s"),
            charset_decode(F.col("gbk"), "gbk").alias("gbk_s"),
        ).collect()
    }
    assert rows[1] == ("café", "你好")
    assert rows[2] == ("ß", "测试")
    assert rows[3] == (None, None)


def test_charset_decode_unknown_charset_fails_at_plan_time(spark):
    import pytest

    from flink_cdc_2_3_0_src_spark.functions.converters import charset_decode

    with pytest.raises(LookupError):
        charset_decode(F.col("x"), "no-such-charset-xyz")


def test_charset_decode_jvm_path_stays_codegen(spark):
    """latin1 must take the JVM decode() path — no Python eval node in
    the plan (the pandas-UDF path is reserved for charsets Spark's
    allowlist rejects, e.g. gbk)."""
    from flink_cdc_2_3_0_src_spark.functions.converters import charset_decode

    df = spark.createDataFrame([(bytes([0xE9]),)], "b binary")
    plan = (
        df.select(charset_decode(F.col("b"), "latin1").alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "ArrowEval" not in plan


def test_charset_roundtrip_property(spark):
    """Round trip: text -> charset bytes -> charset_decode == text, for
    every charset in both dispatch families that can represent it."""
    from flink_cdc_2_3_0_src_spark.functions.converters import charset_decode

    cases = [
        ("latin1", "Àéîõü ÿ ±"),
        ("iso-8859-1", "façade naïve"),
        ("ascii", "plain ascii 123"),
        ("gbk", "汉字编码测试"),
        ("big5", "繁體中文"),
        ("shift-jis", "日本語テスト"),
        ("cp1251", "Привет мир"),
    ]
    py_codec = {
        "latin1": "latin-1", "iso-8859-1": "latin-1", "ascii": "ascii",
        "gbk": "gbk", "big5": "big5", "shift-jis": "shift_jis",
        "cp1251": "cp1251",
    }
    for cs, text in cases:
        df = spark.createDataFrame([(text.encode(py_codec[cs]),)], "b binary")
        got = df.select(charset_decode(F.col("b"), cs).alias("s")).collect()[0]["s"]
        assert got == text, f"{cs}: {got!r} != {text!r}"


# --- r5: the MySqlTimezoneITCase-style matrix sweep ------------------
# {session timezone} × {server-time-zone} × the full temporal converter
# matrix in ONE parametrized test: every decoded value must (a) equal
# the stdlib-derived expectation and (b) be bit-identical across all
# session timezones (the reference's per-DB timezone ITCases pin the
# same two properties: MySqlTimezoneITCase, MongoDBTimeZoneITCase,
# SqlServerTimezoneITCase; RowDataDebeziumDeserializeSchema.java:469-519).

_SESSION_TZS = ["UTC", "America/New_York", "Asia/Shanghai", "Europe/Berlin"]
_SERVER_TZS = ["UTC", "America/New_York", "Asia/Shanghai", "+05:30", "-08:00"]
# winter + summer (DST flip), pre-epoch, epoch, sub-second edge
_MATRIX_INSTANTS_US = [
    1705322096123456,   # 2024-01-15T12:34:56.123456Z (EST/CST winter)
    1721086701000001,   # 2024-07-15T23:38:21.000001Z (EDT summer)
    -500000,            # 1969-12-31T23:59:59.5Z pre-epoch
    0,                  # epoch
    951827696999999,    # 2000-02-29 leap day
]


def _expected_wall(us, server_tz):
    """Stdlib-independent expectation: instant -> server_tz wall clock."""
    import datetime as dt
    from zoneinfo import ZoneInfo

    inst = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(
        microseconds=us
    )
    if server_tz.startswith(("+", "-")):
        sign = 1 if server_tz[0] == "+" else -1
        hh, mm = server_tz[1:].split(":")
        tz = dt.timezone(sign * dt.timedelta(hours=int(hh), minutes=int(mm)))
    else:
        tz = ZoneInfo(server_tz)
    return inst.astimezone(tz).replace(tzinfo=None)


def _decode_matrix(spark, server_tz):
    import datetime as dt

    rows = []
    for us in _MATRIX_INSTANTS_US:
        inst = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(
            microseconds=us
        )
        z = inst.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"
        rows.append(
            (
                us,
                us // 86_400_000_000,            # days (floor toward -inf for >=0 only; pre-epoch handled below)
                (us - (us % 1000)) // 1000,      # millis (truncate toward -inf)
                us,
                us * 1000,                       # nanos
                z,
                abs(us) % 86_400_000_000,        # micros of day
            )
        )
    df = spark.createDataFrame(
        rows, "us bigint, days bigint, ms bigint, us2 bigint, ns bigint, z string, tod bigint"
    )
    out = df.select(
        "us",
        C.debezium_date(F.col("days").cast("int")).alias("d"),
        C.debezium_timestamp_millis(F.col("ms")).alias("t_ms"),
        C.debezium_timestamp_micros(F.col("us2")).alias("t_us"),
        C.debezium_timestamp_nanos(F.col("ns")).alias("t_ns"),
        C.zoned_timestamp_to_ntz(F.col("z"), server_tz).alias("t_z"),
        C.debezium_time_micros(F.col("tod")).alias("tod_s"),
    ).orderBy("us")
    return [tuple(r) for r in out.collect()]


def test_timezone_matrix_sweep(spark):
    """All converters, all server tzs, all session tzs: decode equals
    the stdlib expectation AND is invariant to the session timezone."""
    import datetime as dt

    epoch = dt.datetime(1970, 1, 1)
    old = spark.conf.get("spark.sql.session.timeZone")
    baseline = {}
    try:
        for session_tz in _SESSION_TZS:
            spark.conf.set("spark.sql.session.timeZone", session_tz)
            for server_tz in _SERVER_TZS:
                got = _decode_matrix(spark, server_tz)
                # (b) session-tz invariance, field by field
                if server_tz in baseline:
                    assert got == baseline[server_tz], (session_tz, server_tz)
                else:
                    baseline[server_tz] = got
                # (a) absolute expectations
                for us, d, t_ms, t_us, t_ns, t_z, tod_s in got:
                    wall = epoch + dt.timedelta(microseconds=us)
                    days = us // 86_400_000_000  # Python floor: -1 pre-epoch
                    assert d == (epoch + dt.timedelta(days=days)).date(), (us, "d")
                    assert t_us == wall, (us, "t_us")
                    ms_trunc = us - (us % 1000)
                    assert t_ms == epoch + dt.timedelta(microseconds=ms_trunc)
                    assert t_ns == wall, (us, "t_ns")
                    assert t_z == _expected_wall(us, server_tz), (
                        us,
                        server_tz,
                        "t_z",
                    )
                    tod = abs(us) % 86_400_000_000
                    h, rem = divmod(tod, 3_600_000_000)
                    m, rem = divmod(rem, 60_000_000)
                    s, frac = divmod(rem, 1_000_000)
                    assert tod_s == f"{h:02d}:{m:02d}:{s:02d}.{frac:06d}"
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_mysql_latin1_is_cp1252(spark):
    """MySQL 'latin1' is cp1252, not ISO-8859-1: 0x80 must decode to €
    (and 0x99 to ™), while the five cp1252 holes stay C1 controls —
    decoding through plain ISO-8859-1 yields control chars instead."""
    from flink_cdc_2_3_0_src_spark.functions.converters import charset_decode

    df = spark.createDataFrame(
        [
            (1, bytes([0x80])),            # €
            (2, bytes([0x93, 0x94])),      # “ ”
            (3, bytes([0x96, 0x99])),      # – ™
            (4, bytes([0x81])),            # cp1252 hole -> stays U+0081
            (5, bytes([0xE9])),            # é (shared with ISO-8859-1)
        ],
        "id bigint, b binary",
    )
    rows = {
        r["id"]: r["s"]
        for r in df.select(
            "id", charset_decode(F.col("b"), "latin1").alias("s")
        ).collect()
    }
    assert rows[1] == "€"
    assert rows[2] == "“”"
    assert rows[3] == "–™"
    assert rows[4] == "\x81"
    assert rows[5] == "é"
    # and it stays a pure JVM plan (decode + translate, no Python)
    plan = (
        df.select(charset_decode(F.col("b"), "latin1").alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan


def test_mysql_utf16_is_big_endian(spark):
    """MySQL utf16/utf32 are BIG-endian; the BOM-less little-endian
    Python default must never be used."""
    from flink_cdc_2_3_0_src_spark.functions.converters import charset_decode

    df = spark.createDataFrame(
        [("A".encode("utf-16-be"), "汉".encode("utf-16-be"), "A".encode("utf-32-be"))],
        "u16 binary, u16cjk binary, u32 binary",
    )
    row = df.select(
        charset_decode(F.col("u16"), "utf16").alias("a"),
        charset_decode(F.col("u16cjk"), "utf16").alias("b"),
        charset_decode(F.col("u32"), "utf32").alias("c"),
    ).collect()[0]
    assert (row["a"], row["b"], row["c"]) == ("A", "汉", "A")


def test_charset_unmapped_name_raises(spark):
    """Names outside the explicit maps raise at plan time — a verbatim
    fall-through to Python's registry could silently pick a codec with
    different byte-order semantics than the MySQL charset of the same
    name."""
    import pytest

    from flink_cdc_2_3_0_src_spark.functions.converters import charset_decode

    with pytest.raises(LookupError, match="unmapped charset"):
        charset_decode(F.col("x"), "armscii8")


def test_postgres_geometry_hexewkb_json(spark):
    """Postgres factory parity: geometry -> {"hexewkb", "srid"} JSON
    (NOT GeoJSON — that's the MySQL factory's shape)."""
    import base64
    import json as J
    import struct as st

    from flink_cdc_2_3_0_src_spark.functions.converters import (
        postgres_geometry_to_json,
    )

    wkb = st.pack("<BIdd", 1, 1, -179.5, 42.25)
    df = spark.createDataFrame(
        [
            ((base64.b64encode(wkb).decode(), 4326),),
            ((base64.b64encode(wkb).decode(), None),),  # srid -> 0
            (None,),
        ],
        "g struct<wkb:string, srid:int>",
    )
    got = [
        r["j"]
        for r in df.select(postgres_geometry_to_json(F.col("g")).alias("j")).collect()
    ]
    assert J.loads(got[0]) == {"hexewkb": wkb.hex().upper(), "srid": 4326}
    assert J.loads(got[1]) == {"hexewkb": wkb.hex().upper(), "srid": 0}
    assert got[2] is None
    # stays JVM-side
    plan = (
        df.select(postgres_geometry_to_json(F.col("g")).alias("j"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan


def test_from_debezium_json_drops_tombstones(spark):
    """Kafka tombstones (value IS NULL — emitted after every delete for
    log compaction) and unparseable payloads must be dropped, never
    expanded into all-NULL ±U row pairs."""
    from pyspark.sql import types as T

    from flink_cdc_2_3_0_src_spark.functions.debezium import from_debezium_json

    df = spark.createDataFrame(
        [
            (None,),                                        # tombstone
            ('not json at all',),                           # unparseable
            ('{"after":{"id":1},"op":"c","ts_ms":5}',),
            ('{"before":{"id":2},"op":"d","ts_ms":6}',),
        ],
        "value string",
    )
    schema = T.StructType([T.StructField("id", T.LongType())])
    rows = sorted(
        from_debezium_json(df, schema).collect(), key=lambda r: r["_seq"]
    )
    assert [(r["id"], r["_op"]) for r in rows] == [(1, "+I"), (2, "-D")]


def test_from_debezium_json_skips_truncate_and_message_ops(spark):
    """Debezium 't' (truncate) and 'm' (message) events carry null
    before AND after — they must be skipped (Debezium's own default,
    skipped.operations=t), never expanded into all-NULL ±U pairs."""
    from pyspark.sql import types as T

    from flink_cdc_2_3_0_src_spark.functions.debezium import from_debezium_json

    df = spark.createDataFrame(
        [
            ('{"op":"t","ts_ms":1}',),                       # truncate
            ('{"op":"m","ts_ms":2}',),                       # message
            ('{"after":{"id":9},"ts_ms":3}',),               # missing op
            ('{"after":{"id":1},"op":"c","ts_ms":5}',),
        ],
        "value string",
    )
    schema = T.StructType([T.StructField("id", T.LongType())])
    rows = from_debezium_json(df, schema).collect()
    assert [(r["id"], r["_op"]) for r in rows] == [(1, "+I")]


def test_charset_decode_malformed_bytes_degrade_to_null(spark):
    """One malformed byte sequence in a Python-codec charset must yield
    NULL for that row, not a task-killing UnicodeDecodeError (same
    degrade-to-NULL policy as the canal decoder / probe_container)."""
    from flink_cdc_2_3_0_src_spark.functions.converters import charset_decode

    df = spark.createDataFrame(
        [
            (1, "汉字".encode("gbk")),
            (2, bytes([0x81, 0x00])),   # invalid GBK second byte
            (3, None),
        ],
        "id long, b binary",
    )
    rows = {
        r["id"]: r["s"]
        for r in df.select(
            "id", charset_decode(F.col("b"), "gbk").alias("s")
        ).collect()
    }
    assert rows == {1: "汉字", 2: None, 3: None}


def test_bson_nested_document_decode_deep(spark):
    """Recursive declared-schema decode: array-of-struct-of-array,
    nested row, dynamic-key map (reference
    MongoDBConnectorDeserializationSchema.java:261-266, :693-771)."""
    import json

    from pyspark.sql import types as T

    from flink_cdc_2_3_0_src_spark.functions.converters import (
        bson_convert,
        bson_raw_schema_for,
    )

    declared = T.StructType(
        [
            T.StructField(
                "a",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("n", T.LongType()),
                            T.StructField("inner", T.ArrayType(T.IntegerType())),
                        ]
                    )
                ),
            ),
            T.StructField(
                "row",
                T.StructType(
                    [
                        T.StructField("s", T.StringType()),
                        T.StructField(
                            "deep",
                            T.StructType([T.StructField("d", T.DecimalType(10, 3))]),
                        ),
                    ]
                ),
            ),
            T.StructField("m", T.MapType(T.StringType(), T.DoubleType())),
        ]
    )
    doc = {
        "a": [
            {"n": {"$numberLong": "7"}, "inner": [{"$numberInt": "1"}, {"$numberInt": "2"}]},
            {"n": {"$numberLong": "9"}, "inner": []},
        ],
        "row": {"s": "x", "deep": {"d": {"$numberDecimal": "12.345"}}},
        "m": {"k1": {"$numberDouble": "1.5"}, "k2": {"$numberDouble": "-2.25"}},
    }
    raw = bson_raw_schema_for(declared)
    df = spark.createDataFrame([(json.dumps(doc),)], "value string")
    out = df.select(
        bson_convert(F.from_json("value", raw), declared).alias("o")
    ).collect()[0]["o"]
    assert out["a"][0]["n"] == 7 and list(out["a"][0]["inner"]) == [1, 2]
    assert out["a"][1]["n"] == 9 and list(out["a"][1]["inner"]) == []
    assert out["row"]["s"] == "x"
    assert str(out["row"]["deep"]["d"]) == "12.345"
    assert out["m"] == {"k1": 1.5, "k2": -2.25}


def test_bson_nested_null_safety(spark):
    """wrapIntoNullableConverter parity at every level: a missing/null
    embedded document stays NULL (not a struct of NULLs), null array
    elements and map values pass through, a null array stays NULL."""
    import json

    from pyspark.sql import types as T

    from flink_cdc_2_3_0_src_spark.functions.converters import (
        bson_convert,
        bson_raw_schema_for,
    )

    declared = T.StructType(
        [
            T.StructField(
                "row", T.StructType([T.StructField("n", T.LongType())])
            ),
            T.StructField("arr", T.ArrayType(T.LongType())),
            T.StructField("m", T.MapType(T.StringType(), T.LongType())),
        ]
    )
    raw = bson_raw_schema_for(declared)
    docs = [
        {"row": None, "arr": [{"$numberLong": "1"}, None], "m": {"k": None}},
        {},  # everything missing
    ]
    df = spark.createDataFrame(
        [(json.dumps(d),) for d in docs], "value string"
    )
    rows = df.select(
        bson_convert(F.from_json("value", raw), declared).alias("o")
    ).collect()
    r0, r1 = rows[0]["o"], rows[1]["o"]
    assert r0["row"] is None  # null doc, NOT Row(n=None)
    assert list(r0["arr"]) == [1, None]
    assert r0["m"] == {"k": None}
    assert r1["row"] is None and r1["arr"] is None and r1["m"] is None


def test_bson_nested_decode_stays_jvm_side(spark):
    """The recursive decode must be pure JVM expressions — no Python
    eval node at any nesting depth."""
    from pyspark.sql import types as T

    from flink_cdc_2_3_0_src_spark.functions.converters import (
        bson_convert,
        bson_raw_schema_for,
    )

    declared = T.StructType(
        [
            T.StructField(
                "a",
                T.ArrayType(
                    T.StructType([T.StructField("n", T.LongType())])
                ),
            ),
            T.StructField("m", T.MapType(T.StringType(), T.IntegerType())),
        ]
    )
    raw = bson_raw_schema_for(declared)
    df = spark.createDataFrame([("{}",)], "value string")
    plan = (
        df.select(bson_convert(F.from_json("value", raw), declared).alias("o"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "ArrowEval" not in plan


def test_bson_raw_schema_rejects_non_string_map_keys():
    import pytest
    from pyspark.sql import types as T

    from flink_cdc_2_3_0_src_spark.functions.converters import bson_raw_schema_for

    with pytest.raises(TypeError, match="StringType"):
        bson_raw_schema_for(T.MapType(T.LongType(), T.StringType()))


def test_sqlserver_converter_factory_datetimeoffset(spark):
    """SqlServer factory (SqlServerDeserializationConverterFactory.java
    :40-79): DATETIMEOFFSET ISO strings — including 7-digit 100 ns
    fractions — re-render as wall-clock NTZ in serverTimeZone, swept
    over server timezones and session timezones (invariance)."""
    import datetime as dt

    from flink_cdc_2_3_0_src_spark.functions.converters import (
        converters_for_types,
        sqlserver_converter_factory,
    )

    cases = [
        # (iso string, expected UTC wall microseconds)
        ("2023-06-15T12:30:45.1234567+02:00", "2023-06-15T10:30:45.123456"),
        ("1969-12-31T23:59:59.9999999Z", "1969-12-31T23:59:59.999999"),
        ("2021-11-07T06:30:00Z", "2021-11-07T06:30:00"),  # DST fall-back hour
    ]
    old = spark.conf.get("spark.sql.session.timeZone")
    baseline = {}
    try:
        for session_tz in ("UTC", "America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", session_tz)
            for server_tz in ("UTC", "America/New_York", "Asia/Shanghai"):
                convs = converters_for_types(
                    {"t": "ZonedTimestamp"},
                    factory=sqlserver_converter_factory(server_tz),
                )
                df = spark.createDataFrame(
                    [(s,) for s, _ in cases], "t string"
                )
                got = [
                    r["o"]
                    for r in df.select(convs["t"](F.col("t")).alias("o")).collect()
                ]
                if server_tz in baseline:
                    assert got == baseline[server_tz], (session_tz, server_tz)
                else:
                    baseline[server_tz] = got
                for (iso, utc_wall), val in zip(cases, got):
                    utc = dt.datetime.fromisoformat(utc_wall)
                    import zoneinfo

                    exp = (
                        utc.replace(tzinfo=dt.timezone.utc)
                        .astimezone(zoneinfo.ZoneInfo(server_tz))
                        .replace(tzinfo=None)
                    )
                    assert val == exp, (iso, server_tz, val, exp)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_db2_factory_falls_back_to_default_matrix(spark):
    """Db2 registers no user-defined converters (no
    Db2DeserializationConverterFactory in the reference): every
    semantic type must resolve to the stock matrix converter."""
    import datetime as dt

    from flink_cdc_2_3_0_src_spark.functions.converters import (
        converters_for_types,
        db2_converter_factory,
    )

    assert db2_converter_factory() == {}
    convs = converters_for_types(
        {"d": "Date", "ts": "MicroTimestamp", "t": "Time"},
        factory=db2_converter_factory(),
    )
    df = spark.createDataFrame([(19000, 5_000_000, 3_600_001)], "d long, ts long, t long")
    r = df.select(
        convs["d"](F.col("d")).alias("d"),
        convs["ts"](F.col("ts")).alias("ts"),
        convs["t"](F.col("t")).alias("t"),
    ).collect()[0]
    assert r["d"] == dt.date(1970, 1, 1) + dt.timedelta(days=19000)
    assert r["ts"] == dt.datetime(1970, 1, 1, 0, 0, 5)
    assert r["t"] == "01:00:00.001000"


def test_converter_factory_unknown_semantic_type_fails_at_plan_time():
    import pytest

    from flink_cdc_2_3_0_src_spark.functions.converters import (
        converters_for_types,
    )

    with pytest.raises(LookupError, match="NoSuchType"):
        converters_for_types({"x": "NoSuchType"})


def test_bson_nested_roundtrip_randomized(spark):
    """Randomized round-trip over random declared schemas: values
    generated in Python, encoded as canonical Extended JSON, decoded by
    the recursive JVM converters — decode(encode(v)) == v at every
    nesting level.  Seeded; one Spark job for all 40 documents."""
    import json
    import random
    from decimal import Decimal

    from pyspark.sql import types as T

    from flink_cdc_2_3_0_src_spark.functions.converters import (
        bson_convert,
        bson_raw_schema_for,
    )

    rng = random.Random(0xBEEF)

    def rand_scalar_type():
        return rng.choice(
            [
                T.LongType(),
                T.IntegerType(),
                T.StringType(),
                T.BooleanType(),
                T.DoubleType(),
                T.DecimalType(10, 3),
            ]
        )

    def rand_type(depth):
        if depth <= 0:
            return rand_scalar_type()
        kind = rng.choice(["scalar", "array", "map", "row"])
        if kind == "scalar":
            return rand_scalar_type()
        if kind == "array":
            return T.ArrayType(rand_type(depth - 1))
        if kind == "map":
            return T.MapType(T.StringType(), rand_type(depth - 1))
        return T.StructType(
            [
                T.StructField(f"f{i}", rand_type(depth - 1))
                for i in range(rng.randint(1, 3))
            ]
        )

    def rand_value(dtype):
        if rng.random() < 0.15:
            return None
        if isinstance(dtype, T.LongType):
            return rng.randint(-(2**62), 2**62)
        if isinstance(dtype, T.IntegerType):
            return rng.randint(-(2**31), 2**31 - 1)
        if isinstance(dtype, T.StringType):
            return "".join(rng.choice("abc xyz") for _ in range(rng.randint(0, 8)))
        if isinstance(dtype, T.BooleanType):
            return rng.random() < 0.5
        if isinstance(dtype, T.DoubleType):
            return round(rng.uniform(-1e6, 1e6), 6)
        if isinstance(dtype, T.DecimalType):
            return Decimal(rng.randint(-(10**9), 10**9)) / 1000
        if isinstance(dtype, T.ArrayType):
            return [rand_value(dtype.elementType) for _ in range(rng.randint(0, 4))]
        if isinstance(dtype, T.MapType):
            return {
                f"k{i}": rand_value(dtype.valueType)
                for i in range(rng.randint(0, 3))
            }
        if isinstance(dtype, T.StructType):
            return {f.name: rand_value(f.dataType) for f in dtype.fields}
        raise AssertionError(dtype)

    def encode(v, dtype):
        """Python value -> canonical Extended JSON shape."""
        if v is None:
            return None
        if isinstance(dtype, T.LongType):
            return {"$numberLong": str(v)}
        if isinstance(dtype, T.IntegerType):
            return {"$numberInt": str(v)}
        if isinstance(dtype, T.DoubleType):
            return {"$numberDouble": repr(v)}
        if isinstance(dtype, T.DecimalType):
            return {"$numberDecimal": str(v)}
        if isinstance(dtype, (T.StringType, T.BooleanType)):
            return v
        if isinstance(dtype, T.ArrayType):
            return [encode(x, dtype.elementType) for x in v]
        if isinstance(dtype, T.MapType):
            return {k: encode(x, dtype.valueType) for k, x in v.items()}
        if isinstance(dtype, T.StructType):
            return {
                f.name: encode(v.get(f.name), f.dataType) for f in dtype.fields
            }
        raise AssertionError(dtype)

    def normalize(v, dtype):
        """Spark Row/array results -> plain Python for comparison."""
        if v is None:
            return None
        if isinstance(dtype, T.ArrayType):
            return [normalize(x, dtype.elementType) for x in v]
        if isinstance(dtype, T.MapType):
            return {k: normalize(x, dtype.valueType) for k, x in v.items()}
        if isinstance(dtype, T.StructType):
            return {
                f.name: normalize(v[f.name], f.dataType) for f in dtype.fields
            }
        return v

    for trial in range(4):
        declared = T.StructType(
            [T.StructField(f"c{i}", rand_type(2)) for i in range(3)]
        )
        vals = [rand_value(declared) or {} for _ in range(10)]
        docs = [json.dumps(encode(v, declared)) for v in vals]
        raw = bson_raw_schema_for(declared)
        df = spark.createDataFrame([(d,) for d in docs], "value string")
        out = [
            normalize(r["o"], declared)
            for r in df.select(
                bson_convert(F.from_json("value", raw), declared).alias("o")
            ).collect()
        ]
        for got, exp in zip(out, vals):
            exp_n = {
                f.name: (exp or {}).get(f.name) for f in declared.fields
            }
            assert got == exp_n, (trial, declared.simpleString(), got, exp_n)
