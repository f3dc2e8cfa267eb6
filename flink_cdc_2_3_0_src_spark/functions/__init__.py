from flink_cdc_2_3_0_src_spark.functions.debezium import (  # noqa: F401
    from_debezium_json,
    to_debezium_json,
)
