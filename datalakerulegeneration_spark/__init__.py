"""PySpark-native data-lake quality engine.

A from-scratch re-architecture of the capabilities of the reference
system VeraZwr/DataLakeRuleGeneration (column profiling, profile-based
column clustering, quality-rule generation/sharing/transfer, cell-level
error detection, statistical outlier detection, schema matching, and
P/R/F1 evaluation against clean ground truth) expressed as Spark
DataFrame/SQL plans, plus the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
the reference does not have.

Execution philosophy (vs the reference's imperative pandas loops):

* every per-column statistic is one expression inside a single wide
  aggregation per table (one scan, partial+final agg, no cell loops);
* every cell-level rule compiles to a native ``Column`` predicate and
  all rules for a table are batched into one pass;
* dictionary lookups are broadcast joins; ground-truth diff is one
  equi-join + unpivot; dedup/similarity are shuffle-conscious
  (LSH banding instead of cross joins).
"""

__version__ = "0.1.0"

from datalakerulegeneration_spark.session import get_spark  # noqa: F401
