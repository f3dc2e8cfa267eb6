"""Canal-JSON / Maxwell-JSON / (deprecated) changelog-json decoders.

The reference's own format guidance (docs/content/formats/
changelog-json.md) deprecates its changelog-json format and points
users at the Debezium / CANAL / MAXWELL CDC formats — so a user
switching from the reference to this engine arrives with topics in any
of the three.  ``functions/debezium.py`` covers Debezium; this module
covers the other two plus the deprecated reference format itself, each
as PURE Spark expressions (from_json + explode + struct surgery — no
Python anywhere).

Envelope shapes:

  canal-json     {"data": [row...], "old": [changed-field rows]|null,
                  "type": "INSERT"|"UPDATE"|"DELETE", "ts": ms,
                  "database", "table", "pkNames": [...]}
                 — data is an ARRAY (one message may carry a batch);
                 for UPDATE, old[i] holds the PREVIOUS values of the
                 fields that changed in data[i].
  maxwell-json   {"database", "table", "type": "insert"|"update"|
                  "delete", "ts": sec, "data": {row},
                  "old": {changed fields}} — one row per message.
  changelog-json {"data": {row}, "op": "+I"|"-U"|"+U"|"-D"}
                 (flink-format-changelog-json 2.1 layout).

Before-image reconstruction (canal/maxwell UPDATE): the old block
carries ONLY changed fields, so the -U image = data overridden by
old's non-null fields.  A field changed *to or from* SQL NULL is
indistinguishable from an absent field in plain JSON — the same
documented ambiguity Flink's canal/maxwell formats carry; columns
where that matters should flow through Debezium's full-image
envelope instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_cdc_2_3_0_src_spark.model import (
    OP_COL,
    OP_DELETE,
    OP_INSERT,
    OP_UPDATE_AFTER,
    OP_UPDATE_BEFORE,
    SEQ_COL,
)


def _merged_before(data_col, old_col, payload_schema: T.StructType):
    """-U image: data's fields overridden by old's non-null fields."""
    return F.struct(
        *[
            F.coalesce(old_col[f.name], data_col[f.name]).alias(f.name)
            for f in payload_schema.fields
        ]
    )


def from_canal_json(
    df: DataFrame,
    payload_schema: T.StructType,
    value_col: str = "value",
) -> DataFrame:
    """Canal-JSON envelope strings → changelog rows (+I/-U/+U/-D with
    ``_seq`` = ts).  Handles the batch ``data`` array (rows explode
    with their positional ``old`` entry via arrays_zip)."""
    env_schema = T.StructType(
        [
            T.StructField("data", T.ArrayType(payload_schema)),
            T.StructField("old", T.ArrayType(payload_schema)),
            T.StructField("type", T.StringType()),
            T.StructField("ts", T.LongType()),
            T.StructField("database", T.StringType()),
            T.StructField("table", T.StringType()),
            T.StructField("pkNames", T.ArrayType(T.StringType())),
        ]
    )
    from flink_cdc_2_3_0_src_spark.operators.changelog import expand_updates

    env = F.from_json(F.col(value_col), env_schema)
    base = df.select(env.alias("e")).filter(
        F.col("e").isNotNull() & F.col("e.data").isNotNull()
    )
    # pair each data row with its positional old row via posexplode +
    # try_element_at (NOT arrays_zip: zipping with a NULL old array
    # yields NULL and would drop every INSERT/DELETE batch; NOT plain
    # element_at: a truncated old array — hostile/malformed producer —
    # would throw under ANSI and kill the scan, try_element_at yields
    # NULL instead)
    paired = base.select(
        F.col("e.type").alias("t"),
        F.col("e.ts").alias(SEQ_COL),
        F.col("e.old").alias("olds"),
        F.posexplode(F.col("e.data")).alias("pos", "d"),
    ).select(
        "t",
        SEQ_COL,
        "d",
        F.try_element_at(F.col("olds"), F.col("pos") + 1).alias("o"),
    )
    # map onto the Debezium (before, after, op) envelope and reuse the
    # single-scan update expansion — ONE pass, no 4-way union re-parsing
    # the JSON per branch
    flat = paired.filter(F.col("t").isin("INSERT", "UPDATE", "DELETE")).select(
        F.when(F.col("t") == "UPDATE", _merged_before(F.col("d"), F.col("o"), payload_schema))
        .when(F.col("t") == "DELETE", F.col("d"))
        .alias("before"),
        F.when(F.col("t") != "DELETE", F.col("d")).alias("after"),
        F.when(F.col("t") == "INSERT", F.lit("c"))
        .when(F.col("t") == "DELETE", F.lit("d"))
        .otherwise(F.lit("u"))
        .alias("op"),
        SEQ_COL,
    )
    return expand_updates(flat, "before", "after", "op", SEQ_COL)


def from_maxwell_json(
    df: DataFrame,
    payload_schema: T.StructType,
    value_col: str = "value",
) -> DataFrame:
    """Maxwell-JSON envelope strings → changelog rows.  Maxwell's ts is
    SECONDS; ``_seq`` keeps it as-is (callers needing sub-second order
    thread their own sequence)."""
    env_schema = T.StructType(
        [
            T.StructField("data", payload_schema),
            T.StructField("old", payload_schema),
            T.StructField("type", T.StringType()),
            T.StructField("ts", T.LongType()),
            T.StructField("database", T.StringType()),
            T.StructField("table", T.StringType()),
        ]
    )
    from flink_cdc_2_3_0_src_spark.operators.changelog import expand_updates

    env = F.from_json(F.col(value_col), env_schema)
    base = df.select(env.alias("e")).filter(
        F.col("e").isNotNull() & F.col("e.data").isNotNull()
    )
    # same single-scan expand_updates routing as the canal decoder
    flat = base.filter(F.col("e.type").isin("insert", "update", "delete")).select(
        F.when(
            F.col("e.type") == "update",
            _merged_before(F.col("e.data"), F.col("e.old"), payload_schema),
        )
        .when(F.col("e.type") == "delete", F.col("e.data"))
        .alias("before"),
        F.when(F.col("e.type") != "delete", F.col("e.data")).alias("after"),
        F.when(F.col("e.type") == "insert", F.lit("c"))
        .when(F.col("e.type") == "delete", F.lit("d"))
        .otherwise(F.lit("u"))
        .alias("op"),
        F.col("e.ts").alias(SEQ_COL),
    )
    return expand_updates(flat, "before", "after", "op", SEQ_COL)


def from_changelog_json(
    df: DataFrame,
    payload_schema: T.StructType,
    value_col: str = "value",
) -> DataFrame:
    """The reference's own (deprecated) changelog-json:
    {"data": {row}, "op": "+I"|"-U"|"+U"|"-D"} — already changelog-
    shaped, so decode is one from_json + flatten; rows with an
    unrecognized op are dropped (format parity: the 2.1 deserializer
    recognizes exactly these four RowKinds)."""
    env_schema = T.StructType(
        [
            T.StructField("data", payload_schema),
            T.StructField("op", T.StringType()),
        ]
    )
    env = F.from_json(F.col(value_col), env_schema)
    flat = df.select(env.alias("e")).filter(
        F.col("e").isNotNull() & F.col("e.data").isNotNull()
    )
    known = flat.filter(
        F.col("e.op").isin(OP_INSERT, OP_UPDATE_BEFORE, OP_UPDATE_AFTER, OP_DELETE)
    )
    return known.select(
        *[F.col("e.data")[f.name].alias(f.name) for f in payload_schema.fields],
        F.col("e.op").alias(OP_COL),
    )


def to_canal_json(
    df: DataFrame,
    payload_cols,
    key_cols=None,
    db: str = "testdb",
    table: str = "t",
    op_col: str = OP_COL,
    seq_col: str = SEQ_COL,
) -> DataFrame:
    """Changelog rows → canal-JSON envelope strings (one data row per
    message; -U/+U pairs become ONE UPDATE whose old block carries the
    full before image — canal writers may emit changed-fields-only, the
    full image is the lossless superset).  FIXTURE/SINK encoder for the
    round-trip tests and for feeding canal-consuming systems.

    ``key_cols``: REQUIRED — the primary-key columns the -U/+U pairing
    joins on IN ADDITION to seq.  Two keys updated at the same seq (one
    transaction, shared commit position) would cross-match under
    seq-only pairing and emit phantom UPDATE envelopes with wrong old
    blocks, so the unsafe seq-only mode is not offered: omitting
    key_cols raises at plan time."""
    if not key_cols:
        raise ValueError(
            "to_canal_json requires key_cols: -U/+U pairing on seq alone "
            "cross-matches keys that share a commit position and emits "
            "phantom UPDATE envelopes — pass the primary-key columns"
        )
    payload = F.struct(*[F.col(c) for c in payload_cols])
    d = df.withColumn("_p", payload)
    ins = d.filter(F.col(op_col) == OP_INSERT).select(
        F.col("_p").alias("drow"),
        F.lit(None).cast(d.schema["_p"].dataType).alias("orow"),
        F.lit("INSERT").alias("type"),
        F.col(seq_col).alias("ts"),
    )
    dels = d.filter(F.col(op_col) == OP_DELETE).select(
        F.col("_p").alias("drow"),
        F.lit(None).cast(d.schema["_p"].dataType).alias("orow"),
        F.lit("DELETE").alias("type"),
        F.col(seq_col).alias("ts"),
    )
    # pair -U with its +U partner by (key, seq) — seq alone cross-
    # matches when one commit position covers several keys
    pair_keys = list(key_cols)
    ua = d.filter(F.col(op_col) == OP_UPDATE_AFTER).select(
        *pair_keys, F.col("_p").alias("drow"), F.col(seq_col).alias("ts")
    )
    ub = d.filter(F.col(op_col) == OP_UPDATE_BEFORE).select(
        *pair_keys, F.col("_p").alias("orow"), F.col(seq_col).alias("ts")
    )
    upd = ua.join(ub, pair_keys + ["ts"], "left").select(
        "drow", "orow", F.lit("UPDATE").alias("type"), "ts"
    )
    rows = ins.unionByName(dels).unionByName(upd)
    return rows.select(
        F.to_json(
            F.struct(
                F.array(F.col("drow")).alias("data"),
                F.when(F.col("orow").isNotNull(), F.array(F.col("orow"))).alias(
                    "old"
                ),
                F.col("type"),
                F.col("ts"),
                F.lit(db).alias("database"),
                F.lit(table).alias("table"),
            )
        ).alias("value")
    )


def from_mongodb_changestream_json(
    df: DataFrame,
    declared_schema: T.StructType,
    value_col: str = "value",
) -> DataFrame:
    """MongoDB change-stream envelopes -> UPSERT-mode changelog rows
    (reference MongoDBConnectorDeserializationSchema.java:120-167).

    The Mongo envelope is NOT Debezium's before/after shape: it carries
    ``operationType`` plus ``fullDocument`` / ``documentKey`` as
    Extended-JSON STRINGS (extractBsonDocument:175-183 re-parses them).
    Op mapping, exactly as the reference:

      insert      -> fullDocument as +I
      update      -> fullDocument as +U ONLY (no -U: change streams have
                     no before image — upsert changelog mode); SKIPPED
                     when fullDocument is null (document deleted before
                     the fullDocument lookup ran, :146-149)
      replace     -> fullDocument as +U
      delete      -> documentKey as -D (key fields only; non-key columns
                     NULL)
      invalidate / drop / dropDatabase / rename / other -> dropped

    ``_seq`` is the clusterTime total order ``t * 2^32 + i`` — the same
    (seconds, increment) lexicographic order ChangeStreamOffset uses.
    Decode of both documents goes through the recursive declared-schema
    BSON converters (bson_document_converters), so nested ARRAY/MAP/ROW
    fields work here too.  Pure JVM: two-level from_json + struct
    surgery, no Python."""
    from flink_cdc_2_3_0_src_spark.functions.converters import (
        bson_document_converters,
    )

    raw_schema, convs = bson_document_converters(declared_schema)
    env_schema = T.StructType(
        [
            T.StructField("operationType", T.StringType()),
            T.StructField("fullDocument", T.StringType()),
            T.StructField("documentKey", T.StringType()),
            T.StructField(
                "clusterTime",
                T.StructType(
                    [
                        T.StructField(
                            "$timestamp",
                            T.StructType(
                                [
                                    T.StructField("t", T.LongType()),
                                    T.StructField("i", T.LongType()),
                                ]
                            ),
                        )
                    ]
                ),
            ),
        ]
    )
    env = F.from_json(F.col(value_col), env_schema)
    ct = env["clusterTime"]["$timestamp"]
    seq = (
        F.coalesce(ct["t"], F.lit(0)) * F.lit(4294967296)
        + F.coalesce(ct["i"], F.lit(0))
    ).alias(SEQ_COL)
    base = df.select(
        env["operationType"].alias("op_type"),
        env["fullDocument"].alias("full_doc"),
        env["documentKey"].alias("doc_key"),
        seq,
    )
    # the document that becomes the row: fullDocument for insert/
    # update/replace, documentKey for delete (reference :134-158)
    picked = base.select(
        F.when(F.col("op_type") == "delete", F.col("doc_key"))
        .otherwise(F.col("full_doc"))
        .alias("doc"),
        F.when(F.col("op_type") == "insert", F.lit(OP_INSERT))
        .when(F.col("op_type").isin("update", "replace"), F.lit(OP_UPDATE_AFTER))
        .when(F.col("op_type") == "delete", F.lit(OP_DELETE))
        .alias(OP_COL),
        SEQ_COL,
    ).filter(
        # unknown/invalidate ops dropped; update with null fullDocument
        # (deleted before the lookup) skipped like the reference
        F.col(OP_COL).isNotNull() & F.col("doc").isNotNull()
    )
    parsed = picked.select(
        F.from_json(F.col("doc"), raw_schema).alias("d"), OP_COL, SEQ_COL
    )
    cols = []
    for f in declared_schema.fields:
        c = F.col("d")[f.name]
        cols.append(convs[f.name](c).alias(f.name) if f.name in convs else c.alias(f.name))
    return parsed.select(*cols, OP_COL, SEQ_COL)
