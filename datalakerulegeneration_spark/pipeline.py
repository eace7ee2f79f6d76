"""End-to-end quality pipeline (reference main.py --mode multi, §3.2).

profile → cluster → share rules → PREPARE per-column params from
profiles (the reference's ``BaseRule.prepare``) → batched detection →
P/R/F1 vs clean ground truth. Each stage is the engine primitive; this
module only wires them and resolves rule parameters from the profiles
table (modal value for constants, min/max + quartiles for ranges,
dominant pattern for pattern rules, max_decimals for precision).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from datalakerulegeneration_spark.clustering import (
    cluster_columns_dbscan,
    shared_rules_by_threshold,
)
from datalakerulegeneration_spark.evaluation import cell_diff, cell_metrics, column_metrics
from datalakerulegeneration_spark.profiling import profile_tables
from datalakerulegeneration_spark.rules import load_all_rules
from datalakerulegeneration_spark.rules.engine import Binding, RuleEngine
from datalakerulegeneration_spark.rules.spec import Rule


def _phone_override(rule: Rule, column: str) -> Rule | None:
    """R6 (rules/evaluation.py:172-177): a phone-named column validates
    pattern/regex rules against the NANP phone regex instead of the
    cluster pattern. Returns the substituted rule, or None."""
    import re as _re

    from datalakerulegeneration_spark.rules.builtin import PHONE_NAME_REGEX, PHONE_REGEX

    t = rule.validate["type"] if rule.validate else None
    if t in ("regex", "pattern") and _re.search(
        PHONE_NAME_REGEX.replace("(?i)", ""), column, _re.I
    ):
        return Rule(
            rule.name,
            applies=rule.applies,
            validate={"type": "regex", "pattern": f"^{PHONE_REGEX}$"},
            description="phone-name override: NANP pattern",
        )
    return None


def prepare_params(rule: Rule, profile_row: dict) -> dict:
    """Resolve a rule's prepared params from a column's profile row —
    the Spark analogue of rules/dictionary_rule.py:329-346."""
    t = rule.validate["type"] if rule.validate else None
    p: dict = {}
    if t == "range":
        p["lo"] = profile_row.get("numeric_min")
        p["hi"] = profile_row.get("numeric_max")
    elif t == "pattern":
        p["dominant_pattern"] = profile_row.get("dominant_pattern")
    elif t == "constant":
        p["expected_value"] = profile_row.get("histogram")
    elif t == "decimal_precision":
        md = profile_row.get("max_decimals")
        if md is not None:
            p["max_decimals"] = int(md)
    elif t == "regex" and rule.validate.get("pattern") is None:
        # derive an anchored regex from the dominant symbolic pattern
        pat = profile_row.get("dominant_pattern")
        if pat:
            import re as _re

            rx = "".join(
                r"\d" if ch == "0" else ("[A-Za-z]" if ch == "A" else ("\\s" if ch == "_" else _re.escape(ch)))
                for ch in pat
            )
            p["pattern"] = f"^{rx}$"
    return p


def generate_bindings(
    profiles: DataFrame,
    clusters: DataFrame,
    shared_rules: DataFrame,
    rules: list[Rule],
    table: str,
    param_source: str = "member",
) -> list[Binding]:
    """Bindings for one table: each member column gets its cluster's
    shared rules.

    ``param_source`` picks whose profile prepares the rule params:

    * ``"member"`` (default) — the column's OWN profile: every column
      is checked against its own ranges/patterns (quality mode);
    * ``"cluster_sample"`` — the cluster's sample column, i.e. the
      first member (min unique_id) whose profile satisfies the rule's
      applies() predicate. This is the reference's behavior: a rule
      carries the conditions captured from the column that generated it
      (rules/evaluation.py:449-655 reads ``rule.conditions`` /
      ``rule.sample_column``), so every cluster member is validated
      against the sample column's values (parity mode).
    """
    if param_source not in ("member", "cluster_sample"):
        raise ValueError(f"unknown param_source: {param_source!r}")
    rule_by_name = {r.name: r for r in rules}
    # member mode only needs this table's profiles; parity mode needs
    # every table's (the sample column can live anywhere)
    prof_src = profiles if param_source == "cluster_sample" else profiles.where(
        profiles.table == table
    )
    all_prof_rows = {r["unique_id"]: r.asDict() for r in prof_src.collect()}
    all_clusters = clusters.collect()
    cid_by_col = {
        r["unique_id"]: r["cluster_id"]
        for r in all_clusters
        if r["unique_id"].startswith(f"{table}::")
    }
    rules_by_cid: dict[int, list[str]] = {}
    for r in shared_rules.collect():
        rules_by_cid.setdefault(r["cluster_id"], []).append(r["rule"])

    sample_uid: dict[tuple[int, str], str] = {}
    if param_source == "cluster_sample":
        from datalakerulegeneration_spark.clustering.sharing import rules_for_profiles

        applicable = {
            (r["unique_id"], r["rule"])
            for r in rules_for_profiles(profiles, rules).collect()
        }
        members_by_cid: dict[int, list[str]] = {}
        for r in all_clusters:
            members_by_cid.setdefault(r["cluster_id"], []).append(r["unique_id"])
        for cid, rns in rules_by_cid.items():
            for rn in rns:
                cands = sorted(
                    u for u in members_by_cid.get(cid, []) if (u, rn) in applicable
                )
                if cands:
                    sample_uid[(cid, rn)] = cands[0]
    import re as _re

    from datalakerulegeneration_spark.rules.builtin import PHONE_NAME_REGEX, PHONE_REGEX

    bindings: list[Binding] = []
    for uid, cid in cid_by_col.items():
        col = uid.split("::", 1)[1]
        # R6: phone-named columns always carry the NANP check — even
        # when no cluster pattern rule attaches (a unique phone column
        # has unique_ratio 1.0 which gates the generic pattern rule off)
        if _re.search(PHONE_NAME_REGEX.replace("(?i)", ""), col, _re.I):
            bindings.append(
                Binding(
                    col,
                    Rule(
                        "matches_phone_pattern",
                        validate={"type": "regex", "pattern": f"^{PHONE_REGEX}$"},
                        description="phone-name override: NANP pattern",
                    ),
                )
            )
        for rn in rules_by_cid.get(cid, []):
            rule = rule_by_name.get(rn)
            if rule is None or rule.validate is None:
                continue
            override = _phone_override(rule, col)
            if override is not None:
                continue  # the unconditional NANP binding above covers it
            src_uid = sample_uid.get((cid, rn), uid) if param_source == "cluster_sample" else uid
            bindings.append(
                Binding(col, rule, prepare_params(rule, all_prof_rows.get(src_uid, {})))
            )
    return bindings


def run_quality_pipeline(
    spark: SparkSession,
    clean_tables: dict[str, DataFrame],
    dirty_tables: dict[str, DataFrame],
    key_cols: dict[str, str] | None = None,
    rules: list[Rule] | None = None,
    eps: float = 0.5,
    min_samples: int = 1,
    share_threshold: float = 0.7,
    param_source: str = "member",
    profile_source: str = "clean",
) -> dict:
    """Full run: returns violations, per-column metrics, and overall
    P/R/F1 per table. Clean tables provide ground truth; dirty tables
    are what gets checked (mirrors the golden-pair evaluation
    protocol, SURVEY §5).

    ``profile_source`` picks which side feeds profiling (and hence
    rule params): ``"clean"`` (default — quality mode: train on known-
    good data) or ``"dirty"`` (reference parity: the published Quintet
    ``column_profile.dictionary`` pickles are DIRTY-data profiles, so
    the reference's rules carry error-contaminated ranges/patterns)."""
    if profile_source not in ("clean", "dirty"):
        raise ValueError(f"unknown profile_source: {profile_source!r}")
    key_cols = key_cols or {}
    rules = rules or load_all_rules()
    # coerce_numeric: pipeline inputs are all-string CSV frames — the
    # reference coerces every column numerically (profiler.py:249), so
    # range/quartile/decimal rules need the coerced stat family
    profiles = profile_tables(
        spark,
        clean_tables if profile_source == "clean" else dirty_tables,
        with_tokens=False,
        coerce_numeric=True,
    )
    clusters = cluster_columns_dbscan(profiles, eps=eps, min_samples=min_samples)
    shared = shared_rules_by_threshold(profiles, clusters, rules, threshold=share_threshold)
    eng = RuleEngine(spark)
    out: dict = {"profiles": profiles, "clusters": clusters, "shared_rules": shared, "tables": {}}
    for name, dirty in dirty_tables.items():
        bindings = generate_bindings(
            profiles, clusters, shared, rules, name, param_source=param_source
        )
        v = eng.detect(dirty, name, bindings, row_id_col=key_cols.get(name))
        truth = cell_diff(dirty, clean_tables[name], key=key_cols.get(name))
        out["tables"][name] = {
            "violations": v,
            "truth": truth,
            "metrics": cell_metrics(v, truth),
            "column_metrics": column_metrics(v, truth),
        }
    return out
