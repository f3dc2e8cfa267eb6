from flink_cdc_2_3_0_src_spark.operators.changelog import (  # noqa: F401
    append_metadata,
    expand_updates,
    materialize,
    normalize_upsert,
    signed,
    signed_agg,
)
