from datalakerulegeneration_spark.ops import dedup, similarity, textqa, multimodal  # noqa: F401
