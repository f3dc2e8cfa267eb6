from flink_cdc_2_3_0_src_spark.plans.chunking import (  # noqa: F401
    ChunkPlanner,
    TableAnalysis,
    calculate_distribution_factor,
    split_evenly_sized_chunks,
)
