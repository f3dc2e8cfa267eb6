from flink_cdc_2_3_0_src_spark.operators.changelog import (  # noqa: F401
    agg_auto,
    append_metadata,
    compact_changelog,
    ensure_retractions,
    expand_updates,
    materialize,
    normalize_upsert,
    signed,
    signed_agg,
    signed_count,
    signed_sum,
)
from flink_cdc_2_3_0_src_spark.operators.maintain import (  # noqa: F401
    maintain,
)
