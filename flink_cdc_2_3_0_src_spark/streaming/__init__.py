from flink_cdc_2_3_0_src_spark.streaming.hybrid import HybridPipeline  # noqa: F401
from flink_cdc_2_3_0_src_spark.streaming.sink import UpsertParquetSink  # noqa: F401
