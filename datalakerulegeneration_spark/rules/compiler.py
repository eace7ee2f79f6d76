"""Rule compiler: specs → native Spark ``Column`` predicates.

Profile-level ``applies`` trees evaluate against the ``profiles``
DataFrame (one row per column); cell-level ``validate`` specs compile to
violation predicates over the data table. All compilation produces
builtin expressions (whole-stage codegen) — no Python UDFs.
"""

from __future__ import annotations

import operator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datalakerulegeneration_spark.rules.spec import Rule

_OPS = {
    "<=": operator.le,
    ">=": operator.ge,
    "<": operator.lt,
    ">": operator.gt,
    "==": operator.eq,
    "!=": operator.ne,
}


def applies_predicate(expr: dict) -> Column:
    """Compile an ``applies`` expression tree to a predicate over
    profile-feature columns."""
    if "all" in expr:
        out = F.lit(True)
        for e in expr["all"]:
            out = out & applies_predicate(e)
        return out
    if "any" in expr:
        out = F.lit(False)
        for e in expr["any"]:
            out = out | applies_predicate(e)
        return out
    if "not" in expr:
        return ~applies_predicate(expr["not"])
    feat, op, val = expr["feature"], expr["op"], expr["value"]
    # string-valued features (basic_data_type etc.) compare as strings;
    # numeric features as doubles — F.lit handles both
    return _OPS[op](F.col(feat), F.lit(val))


def rules_for_profiles(profiles: DataFrame, rules: list[Rule]) -> DataFrame:
    """Which rules apply to which columns: one boolean column per rule
    over the profiles DataFrame → long ``(unique_id, rule)`` pairs.

    This replaces the reference's per-profile Python loop
    (rules/evaluation.py:244-300) with a single select over the (tiny)
    profiles table.
    """
    checks = [
        F.when(applies_predicate(r.applies), F.lit(r.name)).alias(f"r_{i}")
        for i, r in enumerate(rules)
        if r.applies is not None
    ]
    if not checks:
        return profiles.sparkSession.createDataFrame([], "unique_id string, rule string")
    wide = profiles.select("unique_id", "table", "column", F.array(*checks).alias("rs"))
    return wide.select(
        "unique_id",
        "table",
        "column",
        F.explode(F.array_compact("rs")).alias("rule"),
    )


# ---------------------------------------------------------------------------
# Cell-level validators — each returns a violation predicate (True = error)
# for row-local specs; set/aggregate-based validators are handled by the
# engine because they need a prepared join.
# ---------------------------------------------------------------------------

ROW_LOCAL_TYPES = {
    "not_null",
    "null",
    "regex",
    "range",
    "length",
    "decimal_precision",
    "enum",
    "date_format",
    "equality",
    "cross_field",
    "pattern",
    "sql",
}


def row_violation(col: str, spec: dict, params: dict | None = None) -> Column:
    """Compile a row-local validator spec to a violation predicate.

    ``params`` carries prepared per-column values (dominant_pattern,
    modal value, quartiles) resolved by the engine from profiles —
    the Spark analogue of the reference's ``BaseRule.prepare``
    (rules/dictionary_rule.py:329-346).
    """
    params = params or {}
    c = F.col(col)
    s = c.cast("string")
    t = spec["type"]
    present = c.isNotNull() & (s != "")

    if t == "not_null":
        # reference flags null/empty cells (rules/evaluation.py:480-482)
        return c.isNull() | (s == "")
    if t == "null":
        # inverse rule: value present where none allowed
        return present
    if t == "regex":
        pat = spec.get("pattern") or params.get("pattern")
        if pat is None:
            raise ValueError("regex rule needs a pattern (spec or prepared)")
        anchored = pat if pat.startswith("^") else f"^(?:{pat})$"
        return present & ~s.rlike(anchored)
    if t == "pattern":
        # validate against the cluster's dominant symbolic pattern.
        # Both sides are RUN-COLLAPSED ("AAA-00" → "A-0") so length-
        # varying values of the same shape don't false-positive —
        # length deviations are the length_within rule's job.
        import re as _re

        from datalakerulegeneration_spark.profiling.patterns import symbolic_pattern

        pat = spec.get("pattern") or params.get("dominant_pattern")
        if pat is None:
            raise ValueError("pattern rule needs prepared dominant_pattern")
        collapsed_pat = _re.sub(r"(.)\1+", r"\1", pat)
        collapsed_cell = F.regexp_replace(symbolic_pattern(c), r"(.)\1+", r"$1")
        return present & (collapsed_cell != F.lit(collapsed_pat))
    if t == "range":
        lo = spec.get("lo", params.get("lo"))
        hi = spec.get("hi", params.get("hi"))
        n = F.expr(f"try_cast(`{col}` as double)")
        v = F.lit(False)
        if lo is not None:
            v = v | (n < F.lit(float(lo)))
        if hi is not None:
            v = v | (n > F.lit(float(hi)))
        # non-numeric values present are also violations (can't be in range)
        return present & (n.isNull() | v)
    if t == "length":
        lo, hi = spec.get("lo"), spec.get("hi")
        ln = F.length(s)
        v = F.lit(False)
        if lo is not None:
            v = v | (ln < int(lo))
        if hi is not None:
            v = v | (ln > int(hi))
        return present & v
    if t == "decimal_precision":
        # non-numeric ⇒ error; trailing-zero-stripped decimals > k ⇒ error
        # (reference rules/evaluation.py:192-200, 604-618)
        k = int(spec.get("max_decimals", params.get("max_decimals", 2)))
        n = F.expr(f"try_cast(`{col}` as double)")
        decs = F.length(F.regexp_replace(F.regexp_extract(s, r"\.(\d+)$", 1), r"0+$", ""))
        return present & (n.isNull() | (decs > k))
    if t == "enum":
        vals = [str(v) for v in spec["values"]]
        return present & ~s.isin(vals)
    if t == "date_format":
        fmt = spec["format"]
        return present & F.try_to_timestamp(s, F.lit(fmt)).isNull()
    if t == "equality":
        v = spec.get("value", params.get("expected_value"))
        return present & (s != F.lit(str(v)))
    if t == "cross_field":
        # row-level SQL predicate that must HOLD; violation = present & !expr
        return present & ~F.expr(spec["expr"])
    if t == "sql":
        # raw violation predicate (True = error), applied WITHOUT the
        # `present` guard — the escape hatch the legacy rule-string
        # dispatcher compiles into (reference detect_error_cells.py:16-32
        # flags empty cells too, so the guard must not apply)
        return F.expr(spec["expr"])
    raise ValueError(f"unknown row-local validator: {t}")
