"""Builtin rule dictionary (reference operators R1-R20).

Mirrors ``rules/dictionary_rule.py:8-243`` + ``rules/custom_rules.py``
+ the typed templates of ``method_2/pipleline_2.py:220-264``, as
declarative specs. Reference quirks consciously preserved or fixed are
noted per rule (SURVEY §7.3.6).
"""

from __future__ import annotations

from datalakerulegeneration_spark.rules.spec import Rule

# NANP phone pattern (reference rules/evaluation.py:172-177 overrides the
# cluster pattern for phone-named columns)
PHONE_REGEX = r"\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}"
PHONE_NAME_REGEX = "(?i)(phone|mobile|contact|cell|fax|tel)"

BUILTIN_RULES: list[Rule] = [
    # R1 uniqueness family (dictionary_rule.py:10-28, custom_rules.py:3-9)
    Rule(
        "is_id",
        applies={"all": [
            {"feature": "unique_ratio", "op": ">=", "value": 1.0},
            {"feature": "null_ratio", "op": "==", "value": 0.0},
        ]},
        validate={"type": "unique"},
        description="all values unique and non-null",
    ),
    Rule(
        "is_unique",
        applies={"feature": "unique_ratio", "op": ">=", "value": 1.0},
        validate={"type": "unique"},
        description="unique_ratio == 1.0",
    ),
    Rule(
        "is_mostly_unique",
        applies={"all": [
            {"feature": "unique_ratio", "op": ">=", "value": 0.95},
            {"feature": "null_ratio", "op": "<", "value": 0.05},
        ]},
        validate={"type": "unique"},
        description="unique_ratio >= 0.95 and null_ratio < 0.05",
    ),
    # R2 constant column (dictionary_rule.py:16-21, 310-312)
    Rule(
        "is_single_value",
        applies={"feature": "distinct_num", "op": "==", "value": 1.0},
        validate={"type": "constant"},
        description="exactly one distinct value; cells differing from it are errors",
    ),
    # R3 null family — NOTE: the reference's is_nullable/is_not_nullable
    # descriptions are swapped (dictionary_rule.py:29-40); we use the
    # sane orientation and record the delta.
    Rule(
        "is_not_nullable",
        applies={"feature": "null_ratio", "op": "==", "value": 0.0},
        validate={"type": "not_null"},
        description="column observed never-null; null/empty cells are errors",
    ),
    Rule(
        "is_mostly_not_null",
        applies={"feature": "null_ratio", "op": "<=", "value": 0.01},
        validate={"type": "not_null"},
        description="null_ratio <= 1%; null cells flagged",
    ),
    # R4 low cardinality (dictionary_rule.py:41-46) — profile-only
    Rule(
        "has_low_cardinality",
        applies={"feature": "unique_ratio", "op": "<", "value": 0.1},
        validate=None,
        description="categorical-like column (profile predicate only)",
    ),
    # R5 pattern conformance via cluster dominant pattern — gated OFF
    # numeric columns (their symbolic patterns legitimately vary in
    # digit count, so pattern checks there are precision poison)
    Rule(
        "matches_dominant_pattern",
        applies={"all": [
            {"feature": "null_ratio", "op": "<", "value": 0.5},
            {"feature": "unique_ratio", "op": "<", "value": 1.0},
            {"not": {"feature": "basic_data_type", "op": "==", "value": "integer"}},
            {"not": {"feature": "basic_data_type", "op": "==", "value": "float"}},
        ]},
        validate={"type": "pattern"},
        description="cell's collapsed symbolic signature != column dominant pattern",
    ),
    # R7 quartile range (dictionary_rule.py:155-172): prepared lo/hi from
    # profile min/max (or Q1/Q3); applies to any numeric-typed column
    # (basic_data_type covers typed columns; type ratios cover
    # number-shaped strings)
    Rule(
        "value_in_range",
        applies={"any": [
            {"feature": "basic_data_type", "op": "==", "value": "integer"},
            {"feature": "basic_data_type", "op": "==", "value": "float"},
            {"feature": "type_ratio_integer", "op": ">=", "value": 0.7},
            {"feature": "type_ratio_float", "op": ">=", "value": 0.7},
        ]},
        validate={"type": "range"},
        description="numeric value outside prepared [lo, hi]",
    ),
    # R9 decimal precision (dictionary_rule.py:182-189)
    Rule(
        "decimal_precision",
        applies={"all": [
            {"feature": "max_decimals", "op": "<=", "value": 6.0},
            {"feature": "max_decimals", "op": ">", "value": 0.0},
        ]},
        validate={"type": "decimal_precision"},
        description="more decimal places than the column's observed max",
    ),
    # R15 3-sigma outliers (rules/evaluation.py:434-440)
    Rule(
        "three_sigma",
        applies={"any": [
            {"feature": "basic_data_type", "op": "==", "value": "float"},
            {"feature": "type_ratio_float", "op": ">=", "value": 0.7},
        ]},
        validate={"type": "three_sigma", "tol": 3.0},
        description="abs(x - mean) > 3*std",
    ),
    # R16 rare categoricals (rules/evaluation.py:441-447)
    Rule(
        "low_frequency_category",
        applies={"feature": "unique_ratio", "op": "<", "value": 0.1},
        validate={"type": "low_frequency", "min_ratio": 0.01},
        description="category frequency < 1%",
    ),
    # R12 boolean-domain (dictionary_rule.py:227-242)
    Rule(
        "top_key_words_boolean",
        applies={"feature": "type_ratio_boolean", "op": ">=", "value": 0.7},
        validate={"type": "enum", "values": [
            "true", "false", "yes", "no", "t", "f", "y", "n", "0", "1",
            "True", "False", "Yes", "No", "TRUE", "FALSE", "YES", "NO",
        ]},
        description="boolean-typed column; non-boolean tokens are errors",
    ),
]


def load_all_rules() -> list[Rule]:
    """Dictionary + custom rules (reference rules/loader.py:4-5)."""
    return list(BUILTIN_RULES)
