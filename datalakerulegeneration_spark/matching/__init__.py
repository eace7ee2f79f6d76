from datalakerulegeneration_spark.matching.similarity import column_match_scores  # noqa: F401
from datalakerulegeneration_spark.matching.hungarian import hungarian  # noqa: F401
from datalakerulegeneration_spark.matching.binding import (  # noqa: F401
    global_assignment,
    bind_rules,
    apply_bound_rules,
)
from datalakerulegeneration_spark.matching.transfer import (  # noqa: F401
    transfer_confidence,
    update_success_rate,
    TRANSFER_LEVELS,
)
