from datalakerulegeneration_spark.rules.spec import Rule, parse_expr, parse_yaml_rules  # noqa: F401
from datalakerulegeneration_spark.rules.builtin import BUILTIN_RULES, load_all_rules  # noqa: F401
from datalakerulegeneration_spark.rules.compiler import applies_predicate, rules_for_profiles  # noqa: F401
from datalakerulegeneration_spark.rules.engine import RuleEngine, VIOLATION_COLUMNS  # noqa: F401
