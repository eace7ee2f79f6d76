from datalakerulegeneration_spark.streaming.profiler_stream import (  # noqa: F401
    IncrementalProfiler,
    stream_profile,
)
from datalakerulegeneration_spark.streaming.stateful import (  # noqa: F401
    stateful_gaussian_flags,
)
from datalakerulegeneration_spark.streaming.curate_stream import (  # noqa: F401
    curate_stream,
)
from datalakerulegeneration_spark.streaming.drift_stream import (  # noqa: F401
    baseline_cdf_at,
    baseline_edges,
    baseline_shares,
    ks_drift_stream,
    psi_drift_stream,
)
from datalakerulegeneration_spark.streaming.windows import (  # noqa: F401
    dedup_stream,
    sessionize_stream,
    windowed_event_counts,
    streaming_gaussian_monitor,
)
from datalakerulegeneration_spark.streaming.rollup_stream import (  # noqa: F401
    finalize_rollup,
    hour_grain_stream,
    merge_hour_grain,
)
from datalakerulegeneration_spark.streaming.dedup_index_stream import (  # noqa: F401
    IncrementalDeduper,
    incremental_dedup_stream,
)
from datalakerulegeneration_spark.streaming.sketch_stream import (  # noqa: F401
    CMSketchMonitor,
    HLLMonitor,
    hll_stream,
    sketch_stream,
)
from datalakerulegeneration_spark.streaming.neardup_index_stream import (  # noqa: F401
    NearDupDeduper,
    neardup_dedup_stream,
)
from datalakerulegeneration_spark.streaming.decon_stream import (  # noqa: F401
    embedding_decontaminate_stream,
)
from datalakerulegeneration_spark.streaming.dsir_stream import (  # noqa: F401
    dsir_score_stream,
)
from datalakerulegeneration_spark.streaming.ann_index_stream import (  # noqa: F401
    AnnIndexIngester,
    ann_ingest_stream,
)
from datalakerulegeneration_spark.streaming.budget_stream import (  # noqa: F401
    BudgetAdmitter,
    budget_admission_stream,
)
from datalakerulegeneration_spark.streaming.domain_guard_stream import (  # noqa: F401
    DomainGuard,
    domain_guard_stream,
)
from datalakerulegeneration_spark.streaming.url_dedup_stream import (  # noqa: F401
    UrlDeduper,
    url_dedup_stream,
)
from datalakerulegeneration_spark.streaming.curate_indexed_stream import (  # noqa: F401
    CurateIndexedDeduper,
    curate_indexed_stream,
)
