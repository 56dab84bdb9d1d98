"""Deterministic sampling operators for training-data mix construction.

A training corpus is assembled as a MIX: per-source / per-language rates
(stratified Bernoulli sampling) and per-group quotas (top-k by a quality
score). Both must be DETERMINISTIC — re-running the pipeline on the same
corpus must select the same rows (reproducible data recipes, replay-safe
incremental builds) — so selection is keyed on a content hash, never on
`rand()`.

Scale shape: hash sampling is a narrow per-row filter (no shuffle, no
state; survives any repartitioning because the decision is a pure function
of the row's key). Quota sampling is one shuffle on the group key with a
rank-k window — Spark's WindowGroupLimit pushes the k-limit into each
shuffle side, so only k rows per group survive any stage. For a stratum so
hot it overwhelms one reducer, pre-filter with `hash_sample` at a rate
that bounds the stratum (two-phase sampling), then take the quota.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SAMPLE_BUCKETS = 1_000_000


def sample_key(key_cols: list[str], salt: str = "") -> Column:
    """Uniform bucket in [0, SAMPLE_BUCKETS) from md5 of the salted key —
    the same integer DuckDB derives with ('0x'||substr(md5(...),1,8)) %
    buckets, which is what makes sampling decisions oracle-checkable.
    ``salt`` decorrelates independent sampling passes over the same keys."""
    concat = F.concat_ws("|", F.lit(salt), *[F.col(c).cast("string") for c in key_cols])
    return (
        F.conv(F.substring(F.md5(concat), 1, 8), 16, 10).cast("long")
        % SAMPLE_BUCKETS
    )


def hash_sample(
    df: DataFrame, key_cols: list[str], rate: float, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff its hash bucket falls
    under ``rate``. Same row set on every run and under any partitioning —
    the reproducible replacement for df.sample()."""
    return df.filter(sample_key(key_cols, salt) < int(rate * SAMPLE_BUCKETS))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    key_cols: list[str],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic rates — the training-mix primitive
    ("keep 50% of English, 20% of everything else"). The rate table enters
    the plan as a CASE expression (tiny, constant-folded); strata missing
    from ``rates`` fall back to ``default_rate``."""
    threshold = None
    for value, rate in sorted(rates.items()):
        cond = F.col(stratum_col) == F.lit(value)
        t = F.lit(int(rate * SAMPLE_BUCKETS))
        threshold = F.when(cond, t) if threshold is None else threshold.when(cond, t)
    threshold = (
        F.lit(int(default_rate * SAMPLE_BUCKETS))
        if threshold is None
        else threshold.otherwise(F.lit(int(default_rate * SAMPLE_BUCKETS)))
    )
    return df.filter(sample_key(key_cols, salt) < threshold)


def weighted_sample(
    df: DataFrame,
    key_cols: list[str],
    weight_col: str,
    k: int,
    tie_col: str,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement (the A-ES scheme
    of Efraimidis & Spirakis 2006): each row draws u in (0,1] from its
    content hash and is ranked by u^(1/w); the top-k ranks are exactly a
    weighted sample without replacement — here reproducible because u is
    the md5 bucket, not rand(). The training-mix use: sample documents
    proportional to length/quality without a giant multinomial draw.

    Scale shape: a narrow per-row key computation + one TakeOrdered(k) —
    no shuffle of the full relation; ties broken by ``tie_col`` for a
    deterministic selection under any partitioning."""
    u = (sample_key(key_cols, salt) + F.lit(1)).cast("double") / F.lit(
        float(SAMPLE_BUCKETS)
    )
    es_key = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    return (
        df.withColumn("__es", es_key)
        .orderBy(F.col("__es").desc(), F.col(tie_col).asc())
        .limit(k)
        .drop("__es")
    )


def cap_per_stratum(
    df: DataFrame,
    stratum_col: str,
    cap: int,
    key_cols: list[str],
    salt: str = "",
) -> DataFrame:
    """Rebalance a skewed mix by downsampling every stratum to ~``cap``
    expected rows (keep-rate min(1, cap/count)) — the domain-mixing
    primitive ("no source may exceed its budget") applied deterministically
    so the same corpus always yields the same mix.

    Scale shape: the per-stratum count is one map-side-combinable agg into
    a tiny broadcast dim; the keep decision is then a narrow per-row
    filter. Bernoulli, so kept counts concentrate at ``cap`` rather than
    hit it exactly — for exact quotas use ``quota_by_score`` (which pays a
    per-stratum shuffle instead)."""
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__cnt"))
    threshold = F.floor(
        F.least(F.lit(1.0), F.lit(float(cap)) / F.col("__cnt").cast("double"))
        * F.lit(SAMPLE_BUCKETS)
    ).cast("long")
    return (
        df.join(F.broadcast(counts), stratum_col)
        .filter(sample_key(key_cols, salt) < threshold)
        .drop("__cnt")
    )


def quota_by_score(
    df: DataFrame,
    group_cols: list[str],
    score_col: str,
    k: int,
    tie_col: str,
) -> DataFrame:
    """Exact top-k rows per group by score (desc), ties broken by
    ``tie_col`` asc for determinism. One shuffle on the group key;
    WindowGroupLimit keeps only k rows per group alive per stage. With
    ``score_col`` set to a hash bucket this is a deterministic fixed-size
    uniform sample per group (reservoir-equivalent, but reproducible)."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(score_col).desc(), F.col(tie_col).asc()
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def token_budget_sample(
    df: DataFrame,
    stratum_col: str,
    token_col: str,
    budgets: dict[str, int],
    key_cols: list[str],
    salt: str = "",
) -> DataFrame:
    """Fill a per-stratum TOKEN budget (not a row quota): rows are taken in
    deterministic hash order within each stratum until the running token
    total would exceed the stratum's budget — the "2B tokens of code, 500M
    of forum posts" mix primitive, where document lengths vary too much for
    row counts to control the mix. A row is kept iff its INCLUSIVE running
    sum fits the budget, so the selection is a pure function of the corpus
    (replay-safe) and never overshoots.

    Strata absent from ``budgets`` get budget 0 (dropped) — an explicit
    recipe beats a silent pass-through.

    Scale shape: one shuffle on the stratum + a running-sum window. A
    stratum is one partition's worth of WINDOW STATE but the running sum
    carries one long, and rows past the budget could be pre-pruned by a
    two-phase variant (hash_sample at ~budget/total_tokens, then exact
    fill) when a stratum is reducer-hot."""
    order_key = sample_key(key_cols, salt)
    budget = None
    for value, b in sorted(budgets.items()):
        cond = F.col(stratum_col) == F.lit(value)
        budget = F.when(cond, F.lit(b)) if budget is None else budget.when(cond, F.lit(b))
    budget = F.lit(0) if budget is None else budget.otherwise(F.lit(0))
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(order_key.asc(), *[F.col(c).asc() for c in key_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    running = F.sum(F.col(token_col).cast("long")).over(w)
    return (
        df.withColumn("__cum", running)
        .filter(F.col("__cum") <= budget)
        .drop("__cum")
    )
