from datalakerulegeneration_spark.functions.stats import (  # noqa: F401
    ks_distance_from_quantiles,
    wasserstein_from_quantiles,
    dataset_similarity,
    quantile_vector,
)
from datalakerulegeneration_spark.functions.text import (  # noqa: F401
    levenshtein_conflicts,
    normalize_value,
    normalize_abbreviations,
)
from datalakerulegeneration_spark.functions.metrics_ml import (  # noqa: F401
    pair_accuracy,
    adjusted_rand_index,
    normalized_mutual_info,
)
