"""Declarative data-quality expectations over any DataFrame.

The reference's only quality check is the duplicate-surrogate-key audit
(gold_dim_branch.py:200 ``groupBy(key).count().filter("count > 1")``); on
Databricks the rest comes from Delta Live Tables *expectations*. This
module is that capability on plain Spark: named boolean rules evaluated
row-wise, with three dispositions —

- ``expectation_report``: rule → (n_pass, n_fail) — the monitoring view;
- ``enforce_expectations``: split into (good, quarantined) frames — the
  medallion gate (quarantine feeds a dead-letter table, good flows on);
- ``fail_on_violation``: raise if any rule fails — the CI/assert mode.

Scale shape: rules are plain Column predicates, so evaluation is a narrow
codegen'd map fused into whatever reads the batch next — no extra scan for
the split (each side is one filter over the same plan), and the report is
one map-side-combinable aggregation. Nulls are treated as FAILURES of a
rule (a rule must affirmatively hold), matching DLT's CONSTRAINT
semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _holds(rule: Column) -> Column:
    # null-safe: a rule that evaluates to NULL did not hold
    return F.coalesce(rule.cast("boolean"), F.lit(False))


def with_expectations(df: DataFrame, rules: dict[str, Column], out: str = "failed_rules") -> DataFrame:
    """Annotate each row with the (possibly empty) array of rule names it
    violates — the lineage-friendly form: downstream can route, count, or
    explain without re-evaluating predicates."""
    checks = [
        F.when(~_holds(rule), F.lit(name)) for name, rule in rules.items()
    ]
    return df.withColumn(out, F.array_compact(F.array(*checks)))


def expectation_report(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One row per rule: (rule, n_pass, n_fail). A single aggregation —
    every rule is a conditional count over the same scan."""
    aggs = []
    for name, rule in rules.items():
        aggs.append(F.sum(_holds(rule).cast("long")).alias(f"__p_{name}"))
        aggs.append(F.sum((~_holds(rule)).cast("long")).alias(f"__f_{name}"))
    row = df.agg(*aggs).first()
    spark = df.sparkSession
    return spark.createDataFrame(
        [(name, row[f"__p_{name}"], row[f"__f_{name}"]) for name in rules],
        "rule string, n_pass long, n_fail long",
    )


def enforce_expectations(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined): rows satisfying EVERY rule vs the rest, the
    quarantined side annotated with its failed rule names. Both sides are
    filters over one annotated plan — Catalyst fuses the predicate into
    the upstream scan for each branch."""
    annotated = with_expectations(df, rules)
    good = annotated.filter(F.size("failed_rules") == 0).drop("failed_rules")
    bad = annotated.filter(F.size("failed_rules") > 0)
    return good, bad


def fail_on_violation(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Assert mode: returns ``df`` untouched if every rule holds on every
    row, else raises with the per-rule failure counts."""
    report = expectation_report(df, rules)
    failures = {r["rule"]: r["n_fail"] for r in report.collect() if r["n_fail"]}
    if failures:
        raise ValueError(f"data-quality expectations violated: {failures}")
    return df
