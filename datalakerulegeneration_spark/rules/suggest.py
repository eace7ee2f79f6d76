"""Profile-driven rule suggestion (reference
generate_rules_from_profile.py:15-49).

The reference walks a pickled dataset profile and emits human-readable
rule suggestions from (a) the dominant data type, (b) column-name
patterns (email/phone/id), (c) the dataset null-rate. Here the same
dispatch runs as ONE expression pass over the ``profiles`` DataFrame —
and each suggestion carries a machine-usable rule spec next to the
reference's sentence, so suggestions feed straight into the compiler
instead of being display strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (suggestion key, applicability predicate over profile columns, spec)
_NULL_ADVISORY_THRESHOLD = 0.1  # reference generate_rules_from_profile.py:38


def suggest_rules(profiles: DataFrame) -> DataFrame:
    """One row per (column, suggestion): ``(table, column, basic_type,
    kind, rule_type, message)``.

    Mirrors the reference's four dispatch families: type rules
    (int/float/date/string), name-pattern rules (email/phone/id),
    and the high-null advisory; the extra ``rule_type`` column is the
    compiler-ready spec type for each suggestion.
    """
    name = F.lower(F.col("column"))
    t = F.col("basic_data_type")
    suggestions = F.array_compact(
        F.array(
            F.when(t == "integer", F.struct(
                F.lit("type").alias("kind"), F.lit("regex").alias("rule_type"),
                F.concat(F.col("column"), F.lit(" should contain only integers.")).alias("message"),
            )),
            F.when(t == "float", F.struct(
                F.lit("type").alias("kind"), F.lit("regex").alias("rule_type"),
                F.concat(F.col("column"), F.lit(" should contain only float or numeric values.")).alias("message"),
            )),
            F.when(t == "date", F.struct(
                F.lit("type").alias("kind"), F.lit("date_format").alias("rule_type"),
                F.concat(F.col("column"), F.lit(" should follow a standard date format (e.g., YYYY-MM-DD).")).alias("message"),
            )),
            F.when(t.isin("string", "categorical"), F.struct(
                F.lit("type").alias("kind"), F.lit("regex").alias("rule_type"),
                F.concat(F.col("column"), F.lit(" should contain text data and not consist of only special characters.")).alias("message"),
            )),
            F.when(name.rlike("email|mail"), F.struct(
                F.lit("name").alias("kind"), F.lit("regex").alias("rule_type"),
                F.concat(F.col("column"), F.lit(" should match a valid email format (e.g., name@example.com).")).alias("message"),
            )),
            F.when(name.rlike("phone|mobile"), F.struct(
                F.lit("name").alias("kind"), F.lit("regex").alias("rule_type"),
                F.concat(F.col("column"), F.lit(" should be a valid phone number (e.g., 10 or 11 digits).")).alias("message"),
            )),
            F.when(name.contains("id"), F.struct(
                F.lit("name").alias("kind"), F.lit("unique").alias("rule_type"),
                F.concat(F.col("column"), F.lit(" should be a unique identifier with no duplicates.")).alias("message"),
            )),
            F.when(F.col("null_ratio") > _NULL_ADVISORY_THRESHOLD, F.struct(
                F.lit("null").alias("kind"), F.lit("not_null").alias("rule_type"),
                F.concat(
                    F.col("column"),
                    F.lit(" has a high null rate ("),
                    F.format_number(F.col("null_ratio") * 100, 2),
                    F.lit("%), consider filling or validating missing values."),
                ).alias("message"),
            )),
        )
    )
    return (
        profiles.select(
            "table", "column", F.col("basic_data_type"), F.explode(suggestions).alias("s")
        )
        .select(
            "table",
            "column",
            F.col("basic_data_type"),
            F.col("s.kind").alias("kind"),
            F.col("s.rule_type").alias("rule_type"),
            F.col("s.message").alias("message"),
        )
    )
