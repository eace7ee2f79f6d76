"""Batched cell-level rule executor → ``violations`` DataFrame.

The reference's executor loops cluster × rule × column × cell
(rules/evaluation.py:449-655). Here all row-local rules bound to a
table are compiled into ONE pass over that table (a single select that
emits an array of violation structs, then one explode); set/aggregate
rules (uniqueness, modal, 3σ, frequency, dictionary, inclusion, FD)
each become a small aggregate + join plan that Catalyst broadcasts.

Violations schema: ``(table, column, row_id, rule, value)``.

Scale notes: the row-local pass is one scan regardless of how many
rules are bound; aggregate rules shuffle only the columns they touch;
dictionary lookups broadcast; the R18 full-column suppressor is a
HAVING-style post-filter, not a second data pass.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datalakerulegeneration_spark.rules.compiler import ROW_LOCAL_TYPES, row_violation
from datalakerulegeneration_spark.rules.spec import Rule

VIOLATION_COLUMNS = ("table", "column", "row_id", "rule", "value")


@dataclass
class Binding:
    """One (column, rule) obligation, with prepared params.

    ``params`` is the Spark analogue of the reference's
    ``BaseRule.prepare`` output (modal value, quartiles, pattern) —
    resolved once from the profiles table, not per cell.
    """

    column: str
    rule: Rule
    params: dict = field(default_factory=dict)


class RuleEngine:
    def __init__(
        self,
        spark: SparkSession,
        dimensions: dict[str, DataFrame] | None = None,
        parents: dict[str, DataFrame] | None = None,
    ):
        self.spark = spark
        # reference dimension tables for semantic-domain rules (R10) —
        # looked up via broadcast anti-joins, never per-cell sets
        self.dimensions = dimensions or {}
        # parent tables for inclusion-dependency rules (J9)
        self.parents = parents or {}

    # -- helpers ----------------------------------------------------------

    @staticmethod
    def _with_row_id(df: DataFrame, row_id_col: str | None) -> tuple[DataFrame, str]:
        # shares with_row_id with the ground-truth differ so predicted
        # and actual error cells land on the same id space
        from datalakerulegeneration_spark.evaluation.ground_truth import with_row_id

        return with_row_id(df, row_id_col), row_id_col or "__pos__"

    def _emit(self, df: DataFrame, table: str, col: str, rule: str) -> DataFrame:
        return df.select(
            F.lit(table).alias("table"),
            F.lit(col).alias("column"),
            F.col("__row_id").alias("row_id"),
            F.lit(rule).alias("rule"),
            F.col(f"`{col}`").cast("string").alias("value"),
        )

    # -- main entry --------------------------------------------------------

    def detect(
        self,
        df: DataFrame,
        table: str,
        bindings: list[Binding],
        row_id_col: str | None = None,
        suppress_full_column: bool = True,
    ) -> DataFrame:
        """Run all bound rules against one table → violations DataFrame.

        Plan shape: every rule that can be decided per-row — the truly
        row-local validators AND the aggregate-backed ones (uniqueness,
        modal, 3σ, frequency, dictionary, inclusion, FD) — lands in ONE
        fused pass over the table. Each aggregate rule contributes a
        small derived frame (duplicate keys, modal value, stats row,
        rare keys, conflict determinants) that is broadcast-joined into
        that single pass, so the big table is traversed once for the
        row stage regardless of how many rules are bound; only the
        per-rule aggregates themselves re-read it. Token-grain rules
        (spell) keep their own explode plan.
        """
        dfi, _ = self._with_row_id(df, row_id_col)
        plans: list[DataFrame] = []

        structs: list = []  # per-row violation struct whens (fused pass)
        joined = dfi  # progressively broadcast-joined lookups
        for b in bindings:
            if b.rule.validate and b.rule.validate["type"] in ROW_LOCAL_TYPES:
                pred = row_violation(b.column, b.rule.validate, b.params)
                structs.append(
                    F.when(
                        pred,
                        F.struct(
                            F.lit(b.column).alias("column"),
                            F.lit(b.rule.name).alias("rule"),
                            F.col(f"`{b.column}`").cast("string").alias("value"),
                        ),
                    )
                )

        # ---- aggregate-backed rules: broadcast lookup + fused predicate ----
        def emit(pred, b):
            structs.append(
                F.when(
                    pred,
                    F.struct(
                        F.lit(b.column).alias("column"),
                        F.lit(b.rule.name).alias("rule"),
                        F.col(f"`{b.column}`").cast("string").alias("value"),
                    ),
                )
            )

        for i, b in enumerate(bindings):
            if not b.rule.validate:
                continue
            t = b.rule.validate["type"]
            c = b.column
            if t in ROW_LOCAL_TYPES:
                continue
            if t == "unique":
                dups = (
                    dfi.groupBy(F.col(f"`{c}`").alias(f"__k{i}"))
                    .agg(F.count(F.lit(1)).alias("__n"))
                    .where(F.col("__n") > 1)
                    .select(f"__k{i}")
                )
                joined = joined.join(
                    F.broadcast(dups), F.col(f"`{c}`") == F.col(f"__k{i}"), "left"
                )
                emit(F.col(f"__k{i}").isNotNull(), b)
            elif t == "constant":
                expected = b.params.get("expected_value")
                if expected is None:
                    # prepare: modal value (reference dictionary_rule.py:
                    # 330-332) — a broadcast 1-row frame, no driver
                    # round-trip; detect() stays fully lazy
                    modal = (
                        dfi.groupBy(F.col(f"`{c}`").cast("string").alias(f"__expected{i}"))
                        .count()
                        .orderBy(F.desc("count"), F.asc(f"__expected{i}"))
                        .limit(1)
                        .select(f"__expected{i}")
                    )
                    joined = joined.crossJoin(F.broadcast(modal))
                    exp_col = F.col(f"__expected{i}")
                else:
                    exp_col = F.lit(str(expected))
                emit(
                    F.col(f"`{c}`").isNotNull() & (F.col(f"`{c}`").cast("string") != exp_col),
                    b,
                )
            elif t == "three_sigma":
                tol = float(b.rule.validate.get("tol", 3.0))
                n = F.expr(f"try_cast(`{c}` as double)")
                stats = dfi.agg(
                    F.avg(n).alias(f"__mu{i}"), F.stddev_samp(n).alias(f"__sd{i}")
                )
                joined = joined.crossJoin(F.broadcast(stats))
                emit(
                    n.isNotNull()
                    & (F.col(f"__sd{i}") > 0)
                    & (F.abs(n - F.col(f"__mu{i}")) > tol * F.col(f"__sd{i}")),
                    b,
                )
            elif t == "low_frequency":
                min_ratio = float(b.rule.validate.get("min_ratio", 0.01))
                freq = dfi.groupBy(F.col(f"`{c}`").alias(f"__k{i}")).agg(
                    F.count(F.lit(1)).alias("__n")
                )
                # total share via a broadcast 1-row aggregate (a
                # global window would coalesce the whole frequency
                # frame into one task — a straggler for
                # high-cardinality columns); no eager count(), no
                # second table scan
                tot = freq.agg(F.sum("__n").alias("__tot"))
                rare = (
                    freq.crossJoin(F.broadcast(tot))
                    .where(F.col("__n") / F.col("__tot") < min_ratio)
                    .select(f"__k{i}")
                )
                joined = joined.join(
                    F.broadcast(rare), F.col(f"`{c}`") == F.col(f"__k{i}"), "left"
                )
                emit(F.col(f"__k{i}").isNotNull(), b)
            elif t == "dictionary":
                dim = self.dimensions[b.rule.validate["dimension"]]
                dc = b.rule.validate["dim_column"]
                norm = F.lower(F.trim(F.col(f"`{c}`").cast("string")))
                keys = dim.select(F.lower(F.trim(F.col(dc))).alias(f"__k{i}")).distinct()
                joined = joined.join(F.broadcast(keys), norm == F.col(f"__k{i}"), "left")
                emit(
                    F.col(f"`{c}`").isNotNull()
                    & (F.col(f"`{c}`").cast("string") != "")
                    & F.col(f"__k{i}").isNull(),
                    b,
                )
            elif t == "inclusion":
                parent = self.parents[b.rule.validate["parent_table"]]
                pc = b.rule.validate["parent_column"]
                keys = parent.select(F.col(pc).alias(f"__k{i}")).distinct()
                joined = joined.join(
                    F.broadcast(keys), F.col(f"`{c}`") == F.col(f"__k{i}"), "left"
                )
                emit(F.col(f"`{c}`").isNotNull() & F.col(f"__k{i}").isNull(), b)
            elif t == "fd":
                det = b.rule.validate["determinant"]
                conflicts = (
                    dfi.groupBy(F.col(f"`{det}`").alias(f"__k{i}"))
                    .agg(F.countDistinct(F.col(f"`{c}`")).alias("__n"))
                    .where(F.col("__n") > 1)
                    .select(f"__k{i}")
                )
                joined = joined.join(
                    F.broadcast(conflicts), F.col(f"`{det}`") == F.col(f"__k{i}"), "left"
                )
                emit(F.col(f"__k{i}").isNotNull(), b)
            elif t == "spell":
                # R11: tokens not in the broadcast dictionary flag the
                # cell (reference rules/evaluation.py:63-99, minus the
                # spaCy-NER exemptions and Wikipedia fallback — no
                # network, SURVEY §7.3.1). One explode + one broadcast
                # anti-join + distinct back to cell grain.
                dic = self.dimensions[b.rule.validate.get("dimension", "words")]
                wc = b.rule.validate.get("dim_column", "word")
                # dictionary entries get the SAME tokenization as the
                # data ('New York' → {new, york}), so multi-word or
                # padded entries still match
                words = (
                    dic.select(
                        F.explode(
                            F.array_remove(
                                F.split(F.lower(F.trim(F.col(wc).cast("string"))), r"[^a-z]+"),
                                "",
                            )
                        ).alias("__w")
                    ).distinct()
                )
                toks = dfi.select(
                    "__row_id",
                    F.col(f"`{c}`"),
                    F.explode(
                        F.array_remove(
                            F.split(F.lower(F.col(f"`{c}`").cast("string")), r"[^a-z]+"), ""
                        )
                    ).alias("__tok"),
                )
                bad = (
                    toks.join(F.broadcast(words), toks["__tok"] == words["__w"], "left_anti")
                    .select("__row_id", f"`{c}`")
                    .distinct()
                )
                plans.append(self._emit(bad, table, c, b.rule.name))
            else:
                raise ValueError(f"unknown validator type: {t}")

        if structs:
            fused = joined.select(
                "__row_id", F.explode(F.array_compact(F.array(*structs))).alias("v")
            ).select(
                F.lit(table).alias("table"),
                F.col("v.column").alias("column"),
                F.col("__row_id").alias("row_id"),
                F.col("v.rule").alias("rule"),
                F.col("v.value").alias("value"),
            )
            plans.append(fused)

        if not plans:
            return self.spark.createDataFrame(
                [], "table string, column string, row_id string, rule string, value string"
            )
        out = plans[0]
        for p in plans[1:]:
            out = out.unionByName(p)

        if suppress_full_column:
            # R18: a rule that flags every row of a column is wrong, drop
            # it (reference rules/evaluation.py:640-647). The row total
            # rides along as a broadcast 1-row aggregate — detect()
            # builds one lazy plan end-to-end.
            tot = df.agg(F.count(F.lit(1)).alias("__tot"))
            per = out.groupBy("column", "rule").agg(F.count(F.lit(1)).alias("__viol"))
            keep = (
                per.crossJoin(F.broadcast(tot))
                .where(F.col("__viol") < F.col("__tot"))
                .select("column", "rule")
            )
            out = out.join(F.broadcast(keep), ["column", "rule"], "left_semi")
        return out
