from datalakerulegeneration_spark.ops import (  # noqa: F401
    curate,
    dedup,
    drift,
    multimodal,
    packing,
    quality_model,
    sampling,
    similarity,
    skew,
    temporal,
    textqa,
)
