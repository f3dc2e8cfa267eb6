from flink_cdc_2_3_0_src_spark.sources.parquet_dialect import (  # noqa: F401
    ParquetTableSource,
)
from flink_cdc_2_3_0_src_spark.sources.scripted_log import (  # noqa: F401
    scripted_changelog,
)
