from datalakerulegeneration_spark.clustering.features import profile_feature_matrix  # noqa: F401
from datalakerulegeneration_spark.clustering.dbscan import dbscan  # noqa: F401
from datalakerulegeneration_spark.clustering.cluster import (  # noqa: F401
    cluster_columns_dbscan,
    cluster_columns_kmeans,
    two_stage_clustering,
)
from datalakerulegeneration_spark.clustering.auto_labeler import (  # noqa: F401
    auto_label_clusters,
    build_rule_config,
)
from datalakerulegeneration_spark.clustering.sharing import (  # noqa: F401
    shared_rules_by_sample_column,
    shared_rules_by_threshold,
    train_profile_thresholds,
    rule_centric_confidence,
)
