"""Probabilistic record linkage (Fellegi & Sunter 1969) over
sorted-neighborhood candidates (Hernandez & Stolfo 1995).

The two classic ER ingredients the similarity-threshold operators in
``dedup.py`` don't cover:

- **Candidate generation that is LINEAR by construction.** Fixed-key
  blocking is quadratic within blocks as the corpus grows (every block's
  population scales with N); the sorted-neighborhood method instead
  sorts each block by a discriminating key and pairs every record with
  only its next ``window`` neighbors — exactly n×window candidate pairs
  no matter how large the blocks get. At 100 TB the block key is the
  shuffle key, the in-block sort rides the shuffle's secondary sort, and
  the lead() window never materializes more than ``window`` extra rows
  per record.

- **Principled scoring instead of a hand-tuned distance cutoff.** Each
  compared field contributes a log-likelihood-ratio weight:
  ln(m/u) when the pair AGREES on the field, ln((1-m)/(1-u)) when it
  disagrees, where m = P(agree | same entity) (a declared prior) and
  u = P(agree | different entities) — estimated EXACTLY from the data as
  the collision probability of a random pair,
  u_f = Σ_v c_v(c_v-1) / (N(N-1)) over the field's value counts. Rare
  fields therefore earn large agreement weights and common fields small
  ones, with no per-field tuning.

Determinism discipline (the repo's standard): u-probabilities are exact
integer-count ratios with ONE double division; the ln() of each weight is
quantized through DECIMAL(18,8) in both engines; the pair score sums the
per-field weights in a FIXED textual order, so DuckDB reproduces every
score bit-for-bit. Agreement is null-safe equality (NULL = NULL agrees),
and u counts NULL as an ordinary value, so both sides treat missing data
identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fs_sorted_neighborhood(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    sort_cols: list[str],
    fields: list[str],
    window: int = 3,
    m_prob: float = 0.95,
    min_score: float | None = None,
) -> DataFrame:
    """Fellegi–Sunter-scored sorted-neighborhood pairs.

    Output: (id_a, id_b, agree_<field>... BOOLEAN, score DOUBLE), one row
    per (record, k-th next neighbor) candidate with k <= ``window``,
    optionally filtered to ``score >= min_score``.

    Two candidate layouts:

    - ``block_cols`` non-empty: lead() within each block — right when the
      blocks are semantic (records in different blocks can't match). The
      window's parallelism is capped at the BLOCK-KEY CARDINALITY, so a
      coarse key (tens of values) serializes at cluster scale.
    - ``block_cols`` empty: canonical GLOBAL sorted neighborhood — an
      exact global rank from ``scd.assign_surrogate_keys`` (driver-frozen
      range buckets; no single-task sort, parallelism scales with the
      cluster, not with any key's cardinality), then rank+k equi-joins.
      This is the 100 TB layout; the blocked mode remains for declared
      semantic blocks.

    Scale shape: one range-bucketed window shuffle (or one block-key
    window shuffle), candidates exactly n×window rows, u-probability
    aggregates broadcast-sized. No pair explosion, no driver-side loop
    over data."""
    n_ids = [id_col] + fields
    # Sorting (or blocking) by a compared field is a natural SNM
    # parameterization, so the projection lists may overlap — dedupe them
    # (first occurrence wins) or the duplicated names make later F.col
    # references ambiguous and the query fails with AnalysisException.
    blocked_proj = list(dict.fromkeys([*block_cols, *sort_cols, *n_ids]))
    global_proj = list(dict.fromkeys([*sort_cols, *n_ids]))
    if block_cols:
        w = Window.partitionBy(*block_cols).orderBy(*sort_cols, id_col)
        led = df.select(*blocked_proj)
        for k in range(1, window + 1):
            led = led.withColumn(f"__id_{k}", F.lead(id_col, k).over(w))
            for f_ in fields:
                led = led.withColumn(f"__{f_}_{k}", F.lead(f_, k).over(w))
        pairs = None
        for k in range(1, window + 1):
            sel = led.filter(F.col(f"__id_{k}").isNotNull()).select(
                F.col(id_col).alias("id_a"),
                F.col(f"__id_{k}").alias("id_b"),
                *[
                    F.col(f_).eqNullSafe(F.col(f"__{f_}_{k}")).alias(f"agree_{f_}")
                    for f_ in fields
                ],
            )
            pairs = sel if pairs is None else pairs.unionByName(sel)
    else:
        from incremental_data_pipeline_spark.operators.scd import (
            assign_surrogate_keys,
        )

        # sort_cols + id is a UNIQUE ordering, so the scalable keygen's
        # result IS the exact global row_number (its documented contract).
        ranked = assign_surrogate_keys(
            df.select(*global_proj), "__fs_rn", [*sort_cols, id_col]
        )
        left = ranked.select(
            F.col(id_col).alias("id_a"),
            *[F.col(f_).alias(f"__a_{f_}") for f_ in fields],
            F.explode(
                F.array(*[F.lit(k) for k in range(1, window + 1)])
            ).alias("__k"),
            "__fs_rn",
        ).withColumn("__rn_b", F.col("__fs_rn") + F.col("__k"))
        right = ranked.select(
            F.col(id_col).alias("id_b"),
            *[F.col(f_).alias(f"__b_{f_}") for f_ in fields],
            F.col("__fs_rn").alias("__rn_b"),
        )
        pairs = left.join(right, "__rn_b").select(
            "id_a",
            "id_b",
            *[
                F.col(f"__a_{f_}").eqNullSafe(F.col(f"__b_{f_}")).alias(f"agree_{f_}")
                for f_ in fields
            ],
        )

    # Exact u-probabilities: collision probability of a uniform random
    # pair, from integer value counts (NULL counted as a value).
    n_total = df.count()  # control-plane scalar
    denom = float(n_total) * float(n_total - 1)
    weights = None
    for f_ in fields:
        wf = (
            df.groupBy(f_)
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(
                (
                    F.sum(F.col("c").cast("double") * (F.col("c") - F.lit(1)).cast("double"))
                    / F.lit(denom)
                ).alias(f"u_{f_}")
            )
        )
        weights = wf if weights is None else weights.crossJoin(wf)
    quant = lambda c: c.cast("decimal(18,8)").cast("double")  # noqa: E731
    weights = weights.select(
        *[
            quant(F.log(F.lit(m_prob) / F.col(f"u_{f_}"))).alias(f"wa_{f_}")
            for f_ in fields
        ],
        *[
            quant(
                F.log((F.lit(1.0) - F.lit(m_prob)) / (F.lit(1.0) - F.col(f"u_{f_}")))
            ).alias(f"wd_{f_}")
            for f_ in fields
        ],
    )
    scored = pairs.crossJoin(F.broadcast(weights))
    score = None
    for f_ in fields:  # FIXED textual order — fp-sum reproducible
        term = F.when(F.col(f"agree_{f_}"), F.col(f"wa_{f_}")).otherwise(
            F.col(f"wd_{f_}")
        )
        score = term if score is None else score + term
    out = scored.select(
        "id_a", "id_b", *[f"agree_{f_}" for f_ in fields], score.alias("score")
    )
    if min_score is not None:
        out = out.filter(F.col("score") >= F.lit(min_score))
    return out


def fs_sorted_neighborhood_sql(
    table: str,
    id_col: str,
    block_cols: list[str],
    sort_cols: list[str],
    fields: list[str],
    window: int = 3,
    m_prob: float = 0.95,
    min_score: float | None = None,
) -> str:
    """DuckDB twin of ``fs_sorted_neighborhood``: same lead() candidates
    (a plain global window when ``block_cols`` is empty — the engine's
    rank+k equi-join produces the identical pair set because the scalable
    rank IS the global row_number), same exact-integer u-probabilities,
    same DECIMAL(18,8)-quantized weights, same fixed-order score sum."""
    order = ", ".join([*sort_cols, id_col])
    part = (
        "PARTITION BY " + ", ".join(block_cols) + " " if block_cols else ""
    )
    lead_cols = []
    for k in range(1, window + 1):
        lead_cols.append(f"lead({id_col}, {k}) OVER win AS __id_{k}")
        for f_ in fields:
            lead_cols.append(f"lead({f_}, {k}) OVER win AS __{f_}_{k}")
    unions = []
    for k in range(1, window + 1):
        agrees = ", ".join(
            f"({f_} IS NOT DISTINCT FROM __{f_}_{k}) AS agree_{f_}" for f_ in fields
        )
        unions.append(
            f"SELECT {id_col} AS id_a, __id_{k} AS id_b, {agrees} "
            f"FROM led WHERE __id_{k} IS NOT NULL"
        )
    u_ctes = []
    for f_ in fields:
        u_ctes.append(
            f"u_{f_} AS (SELECT sum(CAST(c AS DOUBLE) * CAST(c - 1 AS DOUBLE))"
            f" / (CAST((SELECT count(*) FROM {table}) AS DOUBLE)"
            f" * CAST((SELECT count(*) FROM {table}) - 1 AS DOUBLE)) AS u"
            f" FROM (SELECT count(*) AS c FROM {table} GROUP BY {f_}))"
        )
    wa = ", ".join(
        f"CAST(CAST(ln({m_prob!r} / (SELECT u FROM u_{f_})) AS DECIMAL(18,8)) AS DOUBLE) AS wa_{f_}"
        for f_ in fields
    )
    wd = ", ".join(
        f"CAST(CAST(ln((1.0 - {m_prob!r}) / (1.0 - (SELECT u FROM u_{f_}))) AS DECIMAL(18,8)) AS DOUBLE) AS wd_{f_}"
        for f_ in fields
    )
    score = " + ".join(
        f"(CASE WHEN agree_{f_} THEN wa_{f_} ELSE wd_{f_} END)" for f_ in fields
    )
    agree_out = ", ".join(f"agree_{f_}" for f_ in fields)
    where = f"WHERE ({score}) >= {min_score!r}" if min_score is not None else ""
    return f"""
    WITH led AS (
      SELECT {id_col}, {', '.join(fields)}, {', '.join(lead_cols)}
      FROM {table}
      WINDOW win AS ({part}ORDER BY {order})),
    cand AS ({' UNION ALL '.join(unions)}),
    {', '.join(u_ctes)},
    w AS (SELECT {wa}, {wd})
    SELECT id_a, id_b, {agree_out}, {score} AS score
    FROM cand CROSS JOIN w
    {where}
    """
