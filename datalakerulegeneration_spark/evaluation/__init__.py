from datalakerulegeneration_spark.evaluation.ground_truth import cell_diff  # noqa: F401
from datalakerulegeneration_spark.evaluation.metrics import (  # noqa: F401
    cell_metrics,
    column_metrics,
    error_type_breakdown,
    merge_errors,
)
