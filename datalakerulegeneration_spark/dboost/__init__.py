from datalakerulegeneration_spark.dboost.expansion import expand  # noqa: F401
from datalakerulegeneration_spark.dboost.analyzers import (  # noqa: F401
    pearson_hints,
    discrete_stats_hints,
    cords_hints,
)
from datalakerulegeneration_spark.dboost.models import (  # noqa: F401
    GaussianModel,
    HistogramModel,
    PartitionedHistogramModel,
    MixtureModel,
    FrozenMixtureModel,
    outliers,
)
