from flink_cdc_2_3_0_src_spark.sources.parquet_dialect import (  # noqa: F401
    ParquetTableSource,
)
from flink_cdc_2_3_0_src_spark.sources.scripted_log import (  # noqa: F401
    scripted_changelog,
)
from flink_cdc_2_3_0_src_spark.sources.jdbc import JdbcDialect  # noqa: F401
from flink_cdc_2_3_0_src_spark.sources.postgres import PostgresDialect  # noqa: F401
from flink_cdc_2_3_0_src_spark.sources.oracle import OracleDialect  # noqa: F401
from flink_cdc_2_3_0_src_spark.sources.sqlserver import SqlServerDialect  # noqa: F401
from flink_cdc_2_3_0_src_spark.sources.db2 import Db2Dialect  # noqa: F401
