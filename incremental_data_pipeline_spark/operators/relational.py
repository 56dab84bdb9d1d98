"""Generic relational operators beyond plain projections/joins/aggs.

These wrap common shapes (top-k per group, dup audit, distinct dim source)
so pipelines compose named operators instead of repeating window/agg
boilerplate. Everything stays declarative — one Catalyst plan, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from incremental_data_pipeline_spark.functions.util import lit_array


def clamped_prefix(values, init: int = 0):
    """Vectorized zero-floored fold: s_i = max(0, s_{i-1} + y_i), s_0=init.

    Closed form over prefix sums (init >= 0): with cs_i = init + Σ_{j<=i} y_j
    and m_i = min(0, cs_0, ..., cs_{i-1}), each clamped value is
    s_i = max(0, cs_i - m_i) — the subtracted running-min is exactly the
    mass absorbed by earlier clamps. Pure numpy ``cumsum``/
    ``minimum.accumulate``/elementwise ops, so the per-group Arrow seams
    (CUSUM, clamped balance) pay no per-row Python cost; int64 throughout,
    so the result is bit-identical to the sequential integer fold.

    Returns the int64 numpy array of clamped values (one per input)."""
    import numpy as np

    y = np.asarray(values, dtype="int64")
    if y.size == 0:
        return y
    cs = init + np.cumsum(y)
    m = np.minimum.accumulate(np.concatenate(([0], cs[:-1])))
    return np.maximum(0, cs - m)


def topk_per_group(
    df: DataFrame, group_by: list[str], order_by: list[Column], k: int, rank_col: str = "rn"
) -> DataFrame:
    """Top-k rows per group via partitioned row_number (the scalable top-k:
    partial top-k per map task, final per reduce partition — Catalyst turns
    the rank filter into a WindowGroupLimit so only k rows per group
    survive the shuffle)."""
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def duplicate_audit(df: DataFrame, keys: list[str]) -> DataFrame:
    """Keys appearing more than once (reference data-quality audit,
    gold_dim_branch.py:200: groupBy(key).count().filter('count > 1'))."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1)


def distinct_dim_source(df: DataFrame, cols: list[str]) -> DataFrame:
    """DISTINCT projection used to source a dimension (reference:
    gold_dim_model.py:35-40 — the one notebook that deduplicated)."""
    return df.select(*cols).distinct()


def salted_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: the left side gets a deterministic salt in
    [0, n_salts) and the right side is replicated once per salt, so a hot
    key's rows spread across ``n_salts`` reducers instead of one straggler
    task. For inner/left joins the result set is identical to the plain
    join (salt only changes the physical partitioning); right/full outer
    would emit each unmatched right row once PER SALT, so those modes are
    rejected. Use when a key's frequency is pathological and AQE's
    skew-join splitting isn't available/enough; cost is an n_salts×
    replication of the (smaller) right side."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how in ('inner','left'); got {how!r} — "
            "replicating the right side per salt would duplicate unmatched "
            "right rows in right/full outer joins"
        )
    salt = F.pmod(F.xxhash64(*[F.col(k) for k in left.columns]), F.lit(n_salts))
    l = left.withColumn("__salt", salt.cast("int"))
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return l.join(r, [*keys, "__salt"], how).drop("__salt")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
) -> DataFrame:
    """Backward as-of join: each left row picks up the payload of the
    latest right row with ``right_ts <= left_ts`` for the same key.

    Spark has no ASOF primitive; the naive theta-join (key equal AND ts <=)
    explodes quadratically per key. This is the scalable formulation: tag
    and union both sides, one shuffle on the key, and a running
    last(ignorenulls) over (ts, right-before-left) order — linear in
    rows, no per-key fan-out. Right side must be unique per (key, ts) for
    deterministic payloads (pre-aggregate if not).
    """
    l = left.withColumn("__is_r", F.lit(0))
    r = right.select(
        *keys, F.col(right_ts).alias(left_ts), *payload
    ).withColumn("__is_r", F.lit(1))
    left_extra = [c for c in left.columns if c not in {*keys, left_ts}]
    for c in payload:
        l = l.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    for c in left_extra:
        r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    cols = [*keys, left_ts, "__is_r", *left_extra, *payload]
    u = l.select(*cols).unionByName(r.select(*cols))
    # right rows sort before left rows at equal ts => ties count as matches
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(left_ts).asc(), F.col("__is_r").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in payload:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("__is_r") == 0).drop("__is_r")


def iqr_outliers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: float = 1.5,
) -> DataFrame:
    """Per-group Tukey-fence outlier detection: rows with value outside
    [q1 - k*iqr, q3 + k*iqr] of their group. The data-quality gate for
    numeric columns (sensor spikes, price glitches) before they poison
    downstream aggregates.

    Scale shape: one exact-percentile aggregation per group (a single
    shuffle with map-side partials over sorted runs), the per-group fence
    table is tiny and broadcast back — the detail side never shuffles. At
    extreme group cardinality swap `percentile` for `percentile_approx`
    (t-digest sketch) at the cost of oracle exactness."""
    q = F.expr(f"percentile({value_col}, array(0.25D, 0.75D))")
    fences = df.groupBy(*group_cols).agg(
        q[0].alias("__q1"), q[1].alias("__q3")
    )
    iqr = F.col("__q3") - F.col("__q1")
    return (
        df.join(F.broadcast(fences), group_cols)
        .filter(
            (F.col(value_col) < F.col("__q1") - F.lit(k) * iqr)
            | (F.col(value_col) > F.col("__q3") + F.lit(k) * iqr)
        )
        .drop("__q1", "__q3")
    )


def interval_count_join(
    anchors: DataFrame,
    probes: DataFrame,
    key_cols: list[str],
    ts_col: str,
    window_seconds: int,
    anchor_id: str,
    count_alias: str = "n_in_window",
    direction: str = "after",
) -> DataFrame:
    """Bucketed batch range join: for every anchor row, count probe rows
    of the same key with timestamp in (anchor_ts, anchor_ts + window]
    (e.g. "clicks within the hour after each purchase" — the batch twin of
    the streaming interval join). ``direction='before'`` flips the window
    to [anchor_ts - window, anchor_ts): probes STRICTLY BEFORE the anchor
    — the leakage-safe direction for point-in-time feature joins, where a
    training label at t may only see history < t.

    Scale shape: a naive theta-join on the time inequality is quadratic
    per key. Bucketing both sides to ``window_seconds``-wide epochs makes
    it an EQUI-join — a probe at time t can only match anchors in its own
    or the previous bucket, so each anchor explodes to exactly 2 (key,
    bucket) probes and the join cost is per-key-per-window density, not
    n². The exact inequality then filters the 2-bucket superset. Every
    anchor survives via the final left join (zero-match anchors count 0).

    Comparisons run on integer MICROSECOND epochs — timestamps carry µs
    precision, and second-truncated epochs would misjudge rows within 1 s
    of the window edges (the SQL twin compares full-precision timestamps).
    """
    if direction not in ("after", "before"):
        raise ValueError(f"direction must be 'after' or 'before'; got {direction!r}")
    w_us = window_seconds * 1_000_000
    epoch = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    p = probes.select(
        *key_cols, epoch(F.col(ts_col)).alias("__pts"),
        F.floor(epoch(F.col(ts_col)) / w_us).alias("__b"),
    )
    bucket_shift = 1 if direction == "after" else -1
    a = anchors.select(
        *key_cols, F.col(anchor_id), epoch(F.col(ts_col)).alias("__ats"),
    ).withColumn(
        "__b",
        F.explode(
            F.array(
                F.floor(F.col("__ats") / w_us),
                F.floor(F.col("__ats") / w_us) + bucket_shift,
            )
        ),
    )
    in_window = (
        (F.col("__pts") > F.col("__ats"))
        & (F.col("__pts") <= F.col("__ats") + w_us)
        if direction == "after"
        else (F.col("__pts") < F.col("__ats"))
        & (F.col("__pts") >= F.col("__ats") - w_us)
    )
    matched = (
        a.join(p, [*key_cols, "__b"])
        .filter(in_window)
        .groupBy(anchor_id)
        .agg(F.count(F.lit(1)).alias(count_alias))
    )
    return (
        anchors.select(*key_cols, anchor_id, F.col(ts_col))
        .join(matched, anchor_id, "left")
        .withColumn(count_alias, F.coalesce(F.col(count_alias), F.lit(0)).cast("long"))
    )


def sessionize(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization (batch): a new session starts when the gap
    to the previous event of the same key exceeds ``gap_minutes``; the
    session index is the running count of session starts — the classic
    two-window formulation (lag for the gap flag, running sum for the id),
    one shuffle on the key.

    This is the BATCH twin of the streaming session_window_agg: same
    session semantics over at-rest data, useful for backfills over history
    that the streaming job will then continue incrementally."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    # Integer MICROSECOND epochs (via ->timestamp, valid for LTZ and NTZ):
    # second-truncated gaps misjudge boundaries for sub-second timestamps —
    # the SQL twin compares at full precision (epoch_us).
    epoch = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    is_new = F.when(
        gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    running = Window.partitionBy(*key_cols).orderBy(ts_col).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("session_idx", F.sum(is_new).over(running).cast("long"))


def bloom_build(
    keys_df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    n_hashes: int = 5,
) -> list[int]:
    """Build a Bloom-filter bitmap (list of ``m_bits/64`` longs) over the
    distinct values of ``keys_df[key_col]``.

    This is the manual twin of Spark's AQE runtime bloom filter
    (spark.sql.optimizer.runtime.bloomFilter.*) for when the build side is
    known up front: the bitmap is built DISTRIBUTED (per-hash positions ->
    per-word bit_or aggregation, one tiny shuffle of <= m/64 groups) and
    only the finished O(m)-bit bitmap is collected — a control-plane
    transfer independent of build-side row count, unlike broadcasting the
    key set itself. Positions use xxhash64(key, seed) which is
    deterministic across executors and sessions.
    """
    n_words = m_bits // 64
    k = F.col(key_col).cast("string")
    pos = [
        F.pmod(F.xxhash64(k, F.lit(i)), F.lit(m_bits)) for i in range(n_hashes)
    ]
    words = (
        keys_df.select(F.explode(F.array(*pos)).alias("p"))
        .select(
            (F.col("p") / 64).cast("long").alias("w"),
            F.call_function("shiftleft", F.lit(1).cast("long"), F.pmod(F.col("p"), F.lit(64)).cast("int")).alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    bitmap = [0] * n_words
    for r in words:
        bitmap[r["w"]] = r["bits"]
    return bitmap


def bloom_prefilter(
    fact: DataFrame,
    bitmap: list[int],
    key_col: str,
    n_hashes: int = 5,
) -> DataFrame:
    """Keep only fact rows whose ``key_col`` MAY be in the bloom ``bitmap``
    (no false negatives; false positives are removed by the subsequent
    exact join).

    Scale shape: the membership test is a pure Tungsten expression over a
    literal array — it runs inside the scan stage, BEFORE the join
    shuffle, so at 100 TB the shuffle moves only rows that can match
    (~selectivity + fp-rate), where a plain shuffle join would move every
    row. This is exactly what a runtime semi-join reduction buys, made
    explicit and testable.
    """
    m_bits = len(bitmap) * 64
    lit_words = lit_array([int(x) for x in bitmap], "array<bigint>")
    k = F.col(key_col).cast("string")
    cond = F.lit(True)
    for i in range(n_hashes):
        p = F.pmod(F.xxhash64(k, F.lit(i)), F.lit(m_bits))
        word = F.element_at(lit_words, (p / 64).cast("int") + 1)
        mask = F.call_function("shiftleft", F.lit(1).cast("long"), F.pmod(p, F.lit(64)).cast("int"))
        cond = cond & (word.bitwiseAND(mask) != 0)
    return fact.filter(cond)


def clamped_running_balance(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    delta_col: str,
) -> DataFrame:
    """Zero-floored running balance per key: bal_i = max(bal_{i-1} + Δ_i, 0)
    — the inventory/credit-ledger recurrence. The clamp makes each step
    depend on the PREVIOUS CLAMPED value, so this is NOT expressible as a
    window aggregate (no associative reformulation exists); it is the one
    relational op here that genuinely needs a per-key ordered scan, and it
    runs as a grouped-map ``applyInPandas`` — the sanctioned Arrow seam,
    this time keyed (one group per Arrow batch) rather than partition-wise.

    Output: one row per key — ``final_bal_cents`` (the clamped balance
    after the last delta), ``n_steps``, ``n_clamps`` (how often the floor
    was hit).

    Scale shape: one shuffle on the key, then a linear in-memory scan per
    group; group size is bounded by per-entity history, not table size.
    The DuckDB oracle replays the same recurrence as a recursive CTE, so
    even this stateful scan is hash-verified, not rows-only."""
    import pandas as pd

    out_schema = ", ".join(
        [f"{c} {t}" for c, t in zip(key_cols, _key_types(df, key_cols))]
        + ["final_bal_cents long", "n_steps long", "n_clamps long"]
    )

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(order_cols, kind="mergesort")
        d = pdf[delta_col].to_numpy(dtype="int64")
        s = clamped_prefix(d)
        # a clamp is a step whose PRE-clamp value went negative:
        # pre_i = s_{i-1} + d_i < 0  (strict, matching the sequential fold)
        pre = np.concatenate(([0], s[:-1])) + d
        head = pdf.iloc[0]
        row = {c: [head[c]] for c in key_cols}
        row.update(
            final_bal_cents=[int(s[-1]) if s.size else 0],
            n_steps=[len(pdf)],
            n_clamps=[int((pre < 0).sum())],
        )
        return pd.DataFrame(row)

    return df.groupBy(*key_cols).applyInPandas(scan, out_schema)


def _key_types(df: DataFrame, cols: list[str]) -> list[str]:
    m = dict(df.dtypes)
    return [m[c] for c in cols]


def cusum_alarms(
    df: DataFrame,
    order_col: str,
    value_col: str,
    k_ref: int,
    h_threshold: int,
) -> DataFrame:
    """One-sided CUSUM change-point detection over an ordered series:
    S_i = max(0, S_{i-1} + (x_i - k)), alarm where S_i > h — the classic
    Page (1954) sequential detector for a sustained upward level shift,
    with reference value ``k_ref`` (the "no change" drift absorbed per
    step) and decision threshold ``h_threshold``. Like
    `clamped_running_balance`, the zero-floor makes each step depend on
    the previous CLAMPED value, so no associative window reformulation
    exists; the series is replayed in a single ordered `applyInPandas`
    scan and the DuckDB oracle replays the identical recurrence as a
    RECURSIVE CTE — hash-verified, not rows-only.

    All arithmetic is integer, so the recurrence is exact in both
    engines. Emits one row per input point: (order, x, cusum, alarm).

    Scale shape: the detector runs on an ALREADY-AGGREGATED series (e.g.
    daily totals — thousands of rows for years of data), so the single
    ordered group is bounded by calendar length, never table size; the
    aggregation feeding it is map-side combinable at any scale."""
    import pandas as pd

    m = dict(df.dtypes)
    out_schema = f"{order_col} {m[order_col]}, x long, cusum long, alarm boolean"

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype="int64")
        s = clamped_prefix(x - k_ref)
        return pd.DataFrame(
            {
                order_col: pdf[order_col].values,
                "x": x,
                "cusum": s,
                "alarm": s > h_threshold,
            }
        )

    return (
        df.select(order_col, value_col)
        .withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(scan, out_schema)
    )


def km_survival(
    life_table: DataFrame,
    t_col: str,
    n_col: str,
    d_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Kaplan-Meier product-limit survival over an ordered life table:
    S_t = S_{t-1} * (n_t - d_t) / n_t, folded in INTEGER parts-per-scale
    (S_t = S_{t-1}*(n_t-d_t) // n_t, S_{-1} = scale) so the running
    product is exact integer arithmetic in any engine — a float product
    (or exp-sum-log) would be rounding-order-dependent. The per-step
    floor loses < 1/scale per step: documented cost of exactness.

    Like the CUSUM/clamped-balance family, the recurrence is inherently
    ordered (each step divides the PREVIOUS rounded value), so it runs
    as one ordered `applyInPandas` scan over the life table — which is
    |distinct event times| rows (weeks/days), never cohort size — and
    the DuckDB oracle replays it as a RECURSIVE CTE.

    Emits (t, n_at_risk, deaths, surv_ppm)."""
    import pandas as pd

    m = dict(life_table.dtypes)
    out_schema = (
        f"{t_col} {m[t_col]}, n_at_risk long, deaths long, surv_ppm long"
    )

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(t_col, kind="mergesort")
        s = scale
        out = []
        for n, d in zip(pdf[n_col], pdf[d_col]):
            s = s * (int(n) - int(d)) // int(n)
            out.append(s)
        return pd.DataFrame(
            {
                t_col: pdf[t_col].values,
                "n_at_risk": pdf[n_col].astype("int64").values,
                "deaths": pdf[d_col].astype("int64").values,
                "surv_ppm": out,
            }
        )

    return (
        life_table.select(t_col, n_col, d_col)
        .withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(scan, out_schema)
    )


def holt_linear(
    df: DataFrame,
    order_col: str,
    value_col: str,
    alpha_inv: int = 4,
    beta_inv: int = 4,
    scale: int = 1000,
) -> DataFrame:
    """Holt double-exponential smoothing (level + trend) with INTEGER
    milli-unit recurrences: with a = 1/alpha_inv and b = 1/beta_inv,

        l_t = (x_t*scale + (alpha_inv-1)*(l_{t-1}+b_{t-1})) // alpha_inv
        b_t = ((l_t - l_{t-1}) + (beta_inv-1)*b_{t-1}) // beta_inv

    — the standard smoother with the float EWMA replaced by floor-div
    integer folds, so the whole trajectory is engine-exact and the
    DuckDB oracle replays it as a recursive CTE (same family as
    `cusum_alarms`/`km_survival`). Initialization: l_0 = x_0*scale,
    b_0 = 0. `fitted_next` = l_t + b_t is the one-step-ahead forecast.

    Scale shape: runs on an already-aggregated series (daily totals),
    one bounded ordered group."""
    import pandas as pd

    m = dict(df.dtypes)
    out_schema = (
        f"{order_col} {m[order_col]}, x long, level_milli long, "
        "trend_milli long, fitted_next_milli long"
    )

    def tdiv(a: int, b: int) -> int:
        # SQL integer division TRUNCATES toward zero; Python's // floors.
        # The trend term goes negative, so the two differ by one there —
        # use the SQL semantics on both sides.
        q = abs(a) // b
        return q if a >= 0 else -q

    def scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        lvl = None
        tr = 0
        levels, trends, fitted = [], [], []
        for x in pdf[value_col]:
            x = int(x)
            if lvl is None:
                lvl = x * scale
                tr = 0
            else:
                prev = lvl
                lvl = tdiv(x * scale + (alpha_inv - 1) * (lvl + tr), alpha_inv)
                tr = tdiv((lvl - prev) + (beta_inv - 1) * tr, beta_inv)
            levels.append(lvl)
            trends.append(tr)
            fitted.append(lvl + tr)
        return pd.DataFrame(
            {
                order_col: pdf[order_col].values,
                "x": pdf[value_col].astype("int64").values,
                "level_milli": levels,
                "trend_milli": trends,
                "fitted_next_milli": fitted,
            }
        )

    return (
        df.select(order_col, value_col)
        .withColumn("__g", F.lit(1))
        .groupBy("__g")
        .applyInPandas(scan, out_schema)
    )
