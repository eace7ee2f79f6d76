"""Rule model: rules are DATA, not Python lambdas.

The reference expresses rules as Python objects with ``applies(profile)``
and ``validate_cell(value)`` callables (rules/base_rule.py:3-12,
rules/dictionary_rule.py:245-346) and serializes the lambdas as the
literal string ``"lambda"`` (utils/rule_utils.py:28-29) — i.e. rules are
not actually round-trippable. Here a rule is a JSON-able spec:

* ``applies``  — a boolean expression tree over profile features
  (evaluated against the ``profiles`` DataFrame);
* ``validate`` — a cell/row predicate spec compiled to a native Spark
  ``Column`` expression by the compiler (no Python in the hot path).

Expression DSL::

    {"feature": "unique_ratio", "op": ">=", "value": 1.0}
    {"all": [expr, ...]} | {"any": [expr, ...]} | {"not": expr}

Validator specs (``type`` selects the compiler)::

    {"type": "not_null"}
    {"type": "regex", "pattern": "^\\d{5}$"}           # fullmatch fails ⇒ error
    {"type": "range", "lo": 0, "hi": 10}               # outside ⇒ error
    {"type": "length", "lo": 1, "hi": 1}
    {"type": "decimal_precision", "max_decimals": 3}
    {"type": "enum", "values": [...]}
    {"type": "date_format", "format": "M/d/yy"}
    {"type": "unique"}                                  # duplicated value ⇒ error
    {"type": "constant"}                                # != modal value ⇒ error
    {"type": "equality", "value": "x"}                  # != x ⇒ error
    {"type": "three_sigma", "tol": 3.0}
    {"type": "low_frequency", "min_ratio": 0.01}
    {"type": "dictionary", "dimension": "cities", "dim_column": "city"}
    {"type": "spell", "dimension": "words", "dim_column": "word"}  # token-grain
    {"type": "pattern"}                                 # cluster dominant_pattern
    {"type": "cross_field", "expr": "a + b == c"}       # row-level SQL predicate
    {"type": "inclusion", "parent_table": "t", "parent_column": "c"}
    {"type": "fd", "determinant": "lhs_col"}            # lhs -> this col
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field


@dataclass
class Rule:
    """A declarative quality rule (reference rules/dictionary_rule.py)."""

    name: str
    applies: dict | None = None  # profile-level predicate (None = manual binding only)
    validate: dict | None = None  # cell-level validator spec (None = profile-only rule)
    severity: str = "error"
    description: str = ""
    sample_columns: tuple[str, ...] = ()  # reference's sample_column cluster anchoring

    def to_json(self) -> str:
        return json.dumps(
            {
                "name": self.name,
                "applies": self.applies,
                "validate": self.validate,
                "severity": self.severity,
                "description": self.description,
                "sample_columns": list(self.sample_columns),
            }
        )

    @staticmethod
    def from_json(s: str) -> "Rule":
        d = json.loads(s)
        return Rule(
            name=d["name"],
            applies=d.get("applies"),
            validate=d.get("validate"),
            severity=d.get("severity", "error"),
            description=d.get("description", ""),
            sample_columns=tuple(d.get("sample_columns", ())),
        )


# ---------------------------------------------------------------------------
# One-line expression parser for YAML rules (reference rules.yaml:4-32,
# e.g. ``is_unique: unique_ratio >= 1.0 and null_ratio == 0``)
# ---------------------------------------------------------------------------

_CMP = re.compile(
    r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*(<=|>=|==|!=|<|>)\s*(-?\d+(?:\.\d+)?)\s*$"
)


def parse_expr(text: str) -> dict:
    """Parse ``feature <op> number [and|or ...]`` into the expression DSL."""
    for joiner, key in ((" and ", "all"), (" or ", "any")):
        if joiner in text:
            return {key: [parse_expr(p) for p in text.split(joiner)]}
    m = _CMP.match(text)
    if not m:
        raise ValueError(f"cannot parse rule expression: {text!r}")
    feat, op, val = m.groups()
    return {"feature": feat, "op": op, "value": float(val)}


def parse_yaml_rules(mapping: dict[str, str]) -> list[Rule]:
    """Build profile-level rules from a ``{name: expression}`` mapping
    (the shape of the reference's rules.yaml)."""
    return [Rule(name=n, applies=parse_expr(e), description=e) for n, e in mapping.items()]


# ---------------------------------------------------------------------------
# R19: legacy rule-description dispatcher (reference
# detect_error_cells.py:16-32) — free-text rule strings like
# ``MUST NOT be NULL`` / ``FIXED LENGTH FIELD 15`` compile to validator
# specs so legacy rule files ingest directly. Semantics mirror the
# reference exactly, including its quirks: values are TRIMMED before
# checking, empty cells DO violate NULL/length/regex rules, and
# CATEGORICAL / LIKELY UNIQUE strings produce no row-level check
# (the reference returns False for both).
# ---------------------------------------------------------------------------

# trimmed, null-safe string rendering of a cell for the legacy checks —
# trimming models Python str.strip() over its FULL whitespace set
# (golden.PY_STRIP_WS; plain trim() strips spaces only and the r10
# six-char ASCII set missed NBSP-padded cells — r10 ADVICE)
def _legacy_cell(col: str) -> str:
    from datalakerulegeneration_spark.evaluation.golden import _PY_STRIP_WS_SQL

    return (
        f"trim(BOTH {_PY_STRIP_WS_SQL} FROM"
        f" coalesce(cast(`{col}` as string), ''))"
    )


def parse_legacy_rule(column: str, text: str) -> Rule:
    """One legacy description string → a :class:`Rule` bound to
    ``column``. The emitted validator is a raw-SQL violation predicate
    (portable Spark/DuckDB subset: no ``\\d``/``\\w`` classes)."""
    cell = _legacy_cell(column)
    sql = None
    if text == "MUST NOT be NULL":
        sql = f"{cell} = ''"
    elif "FIXED LENGTH FIELD" in text:
        m = re.findall(r"\d+", text)
        if not m:
            raise ValueError(f"FIXED LENGTH FIELD rule needs a length: {text!r}")
        sql = f"length({cell}) <> {int(m[0])}"
    elif text.startswith("NUMERIC FIELD"):
        sql = f"NOT regexp_like({cell}, '^[0-9.,]+$')"
    elif text.startswith("STRUCTURED FIELD"):
        sql = f"NOT regexp_like({cell}, '^[A-Za-z0-9_-]+$')"
    elif text.startswith(("CATEGORICAL FIELD", "LIKELY UNIQUE FIELD")):
        sql = None  # reference: no row-level check for these
    else:
        sql = None  # unknown strings are inert, as in the reference
    return Rule(
        name=text,
        validate={"type": "sql", "expr": sql} if sql else None,
        description=text,
    )


def parse_legacy_rules(rules_dict: dict[str, list[str]]) -> list[tuple[str, Rule]]:
    """Whole legacy rules file ``{column: [description, ...]}`` →
    ``(column, Rule)`` pairs ready for engine bindings."""
    return [
        (col, parse_legacy_rule(col, text))
        for col, texts in rules_dict.items()
        for text in texts
    ]
