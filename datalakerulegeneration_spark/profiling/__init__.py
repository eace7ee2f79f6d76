from datalakerulegeneration_spark.profiling.profiler import (  # noqa: F401
    profile_table,
    profile_tables,
    scalar_stats_long,
    dataset_profile,
)
