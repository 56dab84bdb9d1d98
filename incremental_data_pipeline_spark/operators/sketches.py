"""Deterministic cardinality sketches.

``approx_count_distinct`` (HyperLogLog++) is the built-in answer, but its
estimate is implementation-specific — no other engine reproduces it, so it
can only ever get a rows-only correctness check. The K-minimum-values
sketch [Bar-Yossef et al. 2002] estimates distinct counts from the k
smallest values of ONE public hash (md5 prefix), which any engine can
re-derive bit-for-bit — giving a cardinality estimator with an exact
cross-engine oracle, the same determinism discipline as the sampling and
MinHash operators.

Estimator: with hashes uniform on [0, M) and U_(k) the k-th smallest
distinct hash, E[U_(k)/M] ~ k/(n+1), so n_hat = (k-1) * M / U_(k) (the
unbiased form). When fewer than k distinct hashes exist the sketch IS the
exact distinct count.

Scale shape: the k-smallest-of-distinct step is a distinct aggregation
(one shuffle, map-side partial) followed by a TakeOrdered(k) — fine up to
very large cardinalities. For extreme streams, ``prefilter_rate`` bounds
the shuffle: only hashes under rate*M can ever be among the k smallest
(valid whenever the sketch fills AND its k-th minimum lands under the
bar, asserted in the output via ``prefilter_ok`` — an under-filled sketch
under a prefilter is reported NOT ok, since the bar may have discarded
real hashes), so the distinct agg sees ~rate*n rows — the standard
bottom-k pre-filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from incremental_data_pipeline_spark.functions.util import FAN_OUT_CHEAP_MAP_BPT, fan_out

HASH_SPACE = float(1 << 32)  # md5 8-hex-digit prefix domain


def hash64(cols: list[str], salt: str = "") -> Column:
    """Public 32-bit hash as BIGINT — `('0x'||substr(md5(x),1,8))::BIGINT`
    in the DuckDB dialect."""
    concat = F.concat_ws("|", F.lit(salt), *[F.col(c).cast("string") for c in cols])
    if not salt:
        concat = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
    return F.conv(F.substring(F.md5(concat), 1, 8), 16, 10).cast("long")


def kmv_distinct(
    df: DataFrame,
    cols: list[str],
    k: int = 256,
    prefilter_rate: float | None = None,
) -> DataFrame:
    """One-row KMV distinct-count estimate over ``cols``.

    Output: ``k_used`` (distinct hashes retained, = k unless cardinality
    < k), ``kth_hash`` (the k-th minimum), ``est_distinct`` (the KMV
    estimate; exact when k_used < k), ``prefilter_ok`` (true when the
    estimate is unaffected by ``prefilter_rate``; always true without)."""
    hv = hash64(cols)
    hashed = df.select(hv.alias("hv"))
    bar = None
    if prefilter_rate is not None:
        bar = int(prefilter_rate * HASH_SPACE)
        hashed = hashed.filter(F.col("hv") < bar)
    mins = hashed.distinct().orderBy("hv").limit(k)
    agg = mins.agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.max("hv").alias("kth_hash"),
    )
    est = (
        F.when(F.col("k_used") < k, F.col("k_used").cast("double")).otherwise(
            (F.col("k_used") - F.lit(1)).cast("double")
            * F.lit(HASH_SPACE)
            / F.col("kth_hash").cast("double")
        )
    ).alias("est_distinct")
    ok = (
        F.lit(True)
        if bar is None
        # Sound iff the sketch filled (k_used == k) AND the retained k-th
        # minimum sits strictly under the bar — then no discarded hash
        # could have displaced any of the k minima. An under-filled sketch
        # (k_used < k) under a prefilter may have discarded hashes >= bar,
        # so validity cannot be concluded locally: report False and retry
        # without the prefilter.
        else (F.col("k_used") == k) & (F.col("kth_hash") < F.lit(bar))
    ).alias("prefilter_ok")
    return agg.select("k_used", "kth_hash", est, ok)


def _bottom_k(df: DataFrame, cols: list[str], k: int) -> DataFrame:
    """Bottom-k distinct public hashes of ``cols`` — the KMV sketch body.

    One distinct aggregation (map-side partial) then TakeOrdered(k); the
    result is k rows regardless of input size, so everything downstream
    is control-plane sized."""
    return df.select(hash64(cols).alias("hv")).distinct().orderBy("hv").limit(k)


def kmv_set_ops(
    df_a: DataFrame,
    df_b: DataFrame,
    cols: list[str],
    k: int = 256,
) -> DataFrame:
    """One-row KMV estimates of |A ∪ B|, |A ∩ B| and Jaccard over the
    distinct values of ``cols`` in two relations.

    KMV sketches are mergeable: bottom-k(bottom-k(A) ∪ bottom-k(B)) IS
    the KMV sketch of A ∪ B, so the union estimate is the plain KMV
    estimator on the merged sketch. For the intersection, any hash in the
    union sketch that belongs to A must appear in A's own bottom-k (it is
    among the k smallest of a superset of A's hashes), so membership
    reduces to semi-joins against the two k-row sketches; with
    ρ = |K ∩ A ∩ B| / |K|, est_intersect = ρ · est_union
    [Beyer et al., SIGMOD 2007]. When the union has fewer than k distinct
    values every estimate is exact.

    Scale shape: one distinct-agg shuffle per side; everything after is
    k-row frames. Output columns: ``k_used``, ``kth_hash``, ``n_both``,
    ``est_union``, ``est_intersect``, ``est_jaccard``."""
    ka = _bottom_k(df_a, cols, k)
    kb = _bottom_k(df_b, cols, k)
    merged = ka.unionByName(kb).distinct().orderBy("hv").limit(k)
    flagged = (
        merged.join(ka.withColumnRenamed("hv", "ha"), merged.hv == F.col("ha"), "left")
        .join(kb.withColumnRenamed("hv", "hb"), merged.hv == F.col("hb"), "left")
        .select(
            "hv",
            (F.col("ha").isNotNull() & F.col("hb").isNotNull()).alias("in_both"),
        )
    )
    agg = flagged.agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.max("hv").alias("kth_hash"),
        F.sum(F.col("in_both").cast("long")).cast("long").alias("n_both"),
    )
    est_union = F.when(
        F.col("k_used") < k, F.col("k_used").cast("double")
    ).otherwise(
        (F.col("k_used") - F.lit(1)).cast("double")
        * F.lit(HASH_SPACE)
        / F.col("kth_hash").cast("double")
    )
    rho = F.when(F.col("k_used") > 0, F.col("n_both").cast("double") / F.col("k_used"))
    return agg.select(
        "k_used",
        "kth_hash",
        "n_both",
        est_union.alias("est_union"),
        (rho * est_union).alias("est_intersect"),
        rho.alias("est_jaccard"),
    )


def kmv_set_ops_oracle_sql(
    inner_a: str, inner_b: str, value_expr: str, k: int = 256
) -> str:
    """DuckDB twin of ``kmv_set_ops``: same md5-prefix hash, same bottom-k
    merge, same ρ·est_union intersection estimator — bit-identical."""
    hash_sql = "('0x' || substring(md5(CAST({v} AS VARCHAR)), 1, 8))::BIGINT"
    ha = hash_sql.format(v=value_expr)
    return f"""
    WITH ka AS (SELECT DISTINCT {ha} AS hv FROM ({inner_a}) ORDER BY hv LIMIT {k}),
    kb AS (SELECT DISTINCT {ha} AS hv FROM ({inner_b}) ORDER BY hv LIMIT {k}),
    merged AS (
      SELECT hv FROM (SELECT hv FROM ka UNION SELECT hv FROM kb)
      ORDER BY hv LIMIT {k}),
    flagged AS (
      SELECT m.hv,
             (m.hv IN (SELECT hv FROM ka) AND m.hv IN (SELECT hv FROM kb))
               AS in_both
      FROM merged m),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS k_used,
             max(hv) AS kth_hash,
             CAST(sum(CASE WHEN in_both THEN 1 ELSE 0 END) AS BIGINT) AS n_both
      FROM flagged)
    SELECT k_used, kth_hash, n_both,
      CASE WHEN k_used < {k} THEN CAST(k_used AS DOUBLE)
           ELSE (k_used - 1) * {HASH_SPACE!r} / CAST(kth_hash AS DOUBLE)
      END AS est_union,
      (CASE WHEN k_used > 0 THEN CAST(n_both AS DOUBLE) / k_used END)
        * (CASE WHEN k_used < {k} THEN CAST(k_used AS DOUBLE)
                ELSE (k_used - 1) * {HASH_SPACE!r} / CAST(kth_hash AS DOUBLE)
           END) AS est_intersect,
      CASE WHEN k_used > 0 THEN CAST(n_both AS DOUBLE) / k_used END
        AS est_jaccard
    FROM agg
    """


def kmv_oracle_sql(inner: str, value_expr: str, k: int = 256) -> str:
    """DuckDB twin of ``kmv_distinct`` over ``value_expr`` drawn from the
    ``inner`` relation (single hashed expression, no salt)."""
    return f"""
    WITH vals AS (SELECT {value_expr} AS val FROM {inner}),
    h AS (SELECT DISTINCT ('0x' || substring(md5(CAST(val AS VARCHAR)), 1, 8))::BIGINT AS hv
          FROM vals),
    mins AS (SELECT hv FROM h ORDER BY hv LIMIT {k})
    SELECT CAST(count(*) AS BIGINT) AS k_used,
           max(hv) AS kth_hash,
           CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
                ELSE (count(*) - 1) * {HASH_SPACE!r} / CAST(max(hv) AS DOUBLE)
           END AS est_distinct,
           TRUE AS prefilter_ok
    FROM mins
    """


# ---------------------------------------------------------------------------
# count-min sketch (deterministic, cross-engine reproducible)
# ---------------------------------------------------------------------------


def _cms_cells(cols: list[str], width: int, depth: int) -> list[Column]:
    """``depth`` cell positions from ONE md5 evaluation: disjoint 8-hex
    windows of the digest are independent 32-bit draws (md5's 128 bits
    give up to depth=4), so one hash per row replaces one per row PER
    DEPTH — measured 2x on the sketch build, and the DuckDB twin is the
    same ``substring(md5(x), 8j+1, 8)`` windows."""
    if depth > 4:
        raise ValueError(f"md5 carries 4 independent 32-bit windows; depth={depth}")
    digest = F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in cols]))
    return [
        (F.conv(F.substring(digest, 1 + 8 * j, 8), 16, 10).cast("long") % width).cast(
            "int"
        )
        for j in range(depth)
    ]


def cms_counters(
    df: DataFrame, cols: list[str], width: int = 1024, depth: int = 3
) -> DataFrame:
    """Count-min sketch counter table [Cormode & Muthukrishnan 2005] over
    the rows of ``df``: ``depth`` independent hash rows of ``width``
    counters, as (d, cell, n) rows. The frequency twin of the KMV
    cardinality sketch, with the same determinism discipline: cells come
    from the public md5 digest (disjoint 8-hex windows, one digest per
    row — see ``_cms_cells``), so any engine rebuilds identical counters.

    Scale shape: each input row expands to ``depth`` (d, cell) pairs in
    the map stage, then ONE map-side-combined shuffle collapses them to
    at most depth×width counters — a fixed-size summary regardless of
    input row count, mergeable across batches by summing cells (the
    incremental path: fold a batch's counters into the stored sketch,
    never rescan history)."""
    cells = _cms_cells(cols, width, depth)
    # Parallelism floor: a small-bytes parquet scan (few splits) would
    # serialize the per-row md5 on a handful of cores; no-op at real scale.
    pairs = fan_out(df, bytes_per_task=FAN_OUT_CHEAP_MAP_BPT).select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).cast("int").alias("d"), c.alias("cell"))
                    for j, c in enumerate(cells)
                ]
            )
        ).alias("p")
    ).select("p.d", "p.cell")
    return pairs.groupBy("d", "cell").agg(F.count(F.lit(1)).cast("long").alias("n"))


def cms_estimate(
    counters: DataFrame,
    keys: DataFrame,
    cols: list[str],
    width: int = 1024,
    depth: int = 3,
    est_alias: str = "cms_est",
) -> DataFrame:
    """Point-query the sketch for each row of ``keys``: the estimate is
    min over the ``depth`` counters the key hashes to — never an
    undercount; overcounts only from cell collisions (bounded by
    e·N/width with probability 1 - e^-depth).

    Scale shape: keys explode to ``depth`` cells, equi-join the
    (≤ depth×width)-row counter table — broadcast-sized by construction —
    then a min-agg per key. No shuffle of the full data."""
    cells = keys.select(
        *cols,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).cast("int").alias("d"), c.alias("cell"))
                    for j, c in enumerate(_cms_cells(cols, width, depth))
                ]
            )
        ).alias("p"),
    ).select(*cols, "p.d", "p.cell")
    return (
        cells.join(F.broadcast(counters), ["d", "cell"], "left")
        .groupBy(*cols)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).cast("long").alias(est_alias))
    )


def kmv_distinct_by_group(
    df: DataFrame,
    group_cols: list[str],
    value_cols: list[str],
    k: int = 256,
) -> DataFrame:
    """Per-group KMV distinct-count estimates: one bottom-k sketch per
    group key, same estimator as ``kmv_distinct``. The per-group sketch is
    what a rollup store keeps per dimension cell — k bounded rows per
    group, mergeable across batches by re-taking the bottom k.

    Scale shape: one distinct aggregation on (group, hash) with map-side
    partials, then a per-group bottom-k window (the rank filter keeps at
    most k rows per group before the final tiny aggregation). Groups are
    assumed to be low-cardinality dimensions (event types, sources);
    per-group data volume is bounded by the distinct-hash count, exactly
    like the global sketch."""
    from pyspark.sql import Window

    hv = hash64(value_cols)
    hashed = df.select(*group_cols, hv.alias("hv")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("hv")
    mins = hashed.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    agg = mins.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.max("hv").alias("kth_hash"),
    )
    est = (
        F.when(F.col("k_used") < k, F.col("k_used").cast("double")).otherwise(
            (F.col("k_used") - F.lit(1)).cast("double")
            * F.lit(HASH_SPACE)
            / F.col("kth_hash").cast("double")
        )
    ).alias("est_distinct")
    return agg.select(*group_cols, "k_used", "kth_hash", est)


def kmv_grouped_oracle_sql(
    inner: str, group_expr: str, group_alias: str, value_expr: str, k: int = 256
) -> str:
    """DuckDB twin of ``kmv_distinct_by_group`` — same md5-prefix hash,
    same per-group bottom-k, same estimator."""
    return f"""
    WITH h AS (
      SELECT DISTINCT {group_expr} AS {group_alias},
             ('0x' || substring(md5(CAST({value_expr} AS VARCHAR)), 1, 8))::BIGINT AS hv
      FROM {inner}),
    r AS (
      SELECT {group_alias}, hv,
             row_number() OVER (PARTITION BY {group_alias} ORDER BY hv) AS rn
      FROM h),
    mins AS (SELECT {group_alias}, hv FROM r WHERE rn <= {k})
    SELECT {group_alias},
           CAST(count(*) AS BIGINT) AS k_used,
           max(hv) AS kth_hash,
           CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
                ELSE (count(*) - 1) * {HASH_SPACE!r} / CAST(max(hv) AS DOUBLE)
           END AS est_distinct
    FROM mins GROUP BY {group_alias}
    """


# ---------------------------------------------------------------------------
# Dyadic range/rank sketch (CMS over dyadic intervals)
# ---------------------------------------------------------------------------


def dyadic_cms_counters(
    df: DataFrame,
    value_col: str,
    levels: int,
    width: int = 2048,
    depth: int = 3,
) -> DataFrame:
    """Rank/range-query sketch [Cormode & Muthukrishnan 2005 §4.2]: a
    count-min sketch over DYADIC intervals of a bounded integer domain
    [0, 2^levels). Level ``l`` buckets the domain into intervals of
    length 2^l (node id = value >> l); any prefix [0, q) decomposes into
    at most ``levels`` dyadic nodes, so rank(q) is answered by at most
    ``levels`` CMS point queries — approximate quantiles/ranks from a
    fixed-size mergeable summary, where a plain CMS can only answer
    point frequencies.

    Determinism discipline matches ``cms_counters``: cells come from md5
    windows over the "l|node" key string, so any engine (the DuckDB
    oracle included) rebuilds identical counters and identical
    estimates.

    Scale shape: values collapse to exact level-0 counts first (ONE
    map-side-combined shuffle bounded by min(rows, domain)); the dyadic
    tree is then built from those counts (≤ 2·domain weighted nodes),
    and the final counter table is ≤ depth×width rows regardless of
    input size. Counters are additive — merge batches by summing cells;
    the incremental path never rescans history."""
    v0 = (
        df.groupBy(F.col(value_col).alias("node0"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    lvl_structs = F.array(
        *[
            F.struct(
                F.lit(l).cast("int").alias("l"),
                F.shiftright(F.col("node0"), l).alias("node"),
            )
            for l in range(levels)
        ]
    )
    nodes = (
        v0.select(F.explode(lvl_structs).alias("s"), "n")
        .groupBy(F.col("s.l").alias("l"), F.col("s.node").alias("node"))
        .agg(F.sum("n").alias("n"))
    )
    cells = _cms_cells(["l", "node"], width, depth)
    pairs = nodes.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).cast("int").alias("d"), c.alias("cell"))
                    for j, c in enumerate(cells)
                ]
            )
        ).alias("p"),
        "n",
    ).select("p.d", "p.cell", "n")
    return pairs.groupBy("d", "cell").agg(F.sum("n").cast("long").alias("n"))


def dyadic_cover(q: int, levels: int) -> list[tuple[int, int]]:
    """The (level, node) dyadic decomposition of the prefix [0, q):
    bit ``l`` of q contributes the node covering
    [q cleared below bit l+1, +2^l) — at most ``levels`` intervals."""
    return [
        (l, 2 * (q >> (l + 1))) for l in range(levels) if (q >> l) & 1
    ]


def dyadic_rank_estimate(
    spark,
    counters: DataFrame,
    probes: list[int],
    levels: int,
    width: int = 2048,
    depth: int = 3,
    probe_alias: str = "probe",
) -> DataFrame:
    """rank(q) = |{v : v < q}| for each probe q, estimated from the
    dyadic CMS: sum of CMS point estimates over q's prefix cover. Never
    an undercount (each CMS point estimate is exact-or-over), so
    ``estimate - exact`` is a non-negative error bounded by
    levels·e·N/width w.h.p.

    Scale shape: the cover is a driver-built constant (≤ levels rows per
    probe — probes are query parameters, not data), joined against the
    broadcast-sized counter table; nothing about the base data is
    touched at estimate time."""
    rows = [
        (int(q), lvl, node)
        for q in probes
        for (lvl, node) in dyadic_cover(int(q), levels)
    ]
    cover = spark.createDataFrame(
        rows, schema=f"{probe_alias} long, l int, node long"
    )
    cells = _cms_cells(["l", "node"], width, depth)
    probed = cover.select(
        probe_alias,
        "l",
        "node",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).cast("int").alias("d"), c.alias("cell"))
                    for j, c in enumerate(cells)
                ]
            )
        ).alias("p"),
    ).select(probe_alias, "l", "node", "p.d", "p.cell")
    per_node = (
        probed.join(F.broadcast(counters), ["d", "cell"], "left")
        .groupBy(probe_alias, "l", "node")
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("node_est"))
    )
    return per_node.groupBy(probe_alias).agg(
        F.sum("node_est").cast("long").alias("rank_est")
    )


# ---------------------------------------------------------------------------
# HyperLogLog (deterministic, cross-engine reproducible)
# ---------------------------------------------------------------------------


def _hll_alpha(m: int) -> float:
    """Bias-correction constant from Flajolet et al. 2007 §4 (the m >= 128
    closed form plus the small-m table). Computed ONCE in Python and
    embedded verbatim (repr) into both the Spark plan and the DuckDB
    oracle, so the two engines multiply by the identical double."""
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}[m]


def hll_registers(df: DataFrame, cols: list[str], p: int = 10) -> DataFrame:
    """HyperLogLog register table [Flajolet et al. 2007] over the values
    of ``cols``: bucket = top ``p`` bits of the public md5-prefix hash,
    register = max over the bucket's hashes of rho(w) = leading zeros of
    the remaining 32-p bits, plus one. Spark's own
    ``approx_count_distinct`` IS HLL++, but its estimate is
    implementation-private; this sketch is rebuilt bit-for-bit by any
    engine (rho via ``length(bin(w))`` — exact integer string length, no
    floating log2), the same cross-engine discipline as the KMV and CMS
    sketches above.

    NULL-bearing keys are dropped (both engines), so the sketch counts
    distinct non-NULL tuples.

    Scale shape: NO distinct pre-aggregation is needed — max is
    idempotent, so duplicates fold away in the map-side partial of ONE
    groupBy over at most 2^p buckets. The register table is a fixed-size
    (≤ 2^p rows) mergeable summary: union two sketches by per-bucket max
    (see ``hll_merge``), the property the streaming fold and the
    union-estimate query rely on."""
    return hll_registers_by_group(df, [], cols, p)


def hll_registers_by_group(
    df: DataFrame, group_cols: list[str], cols: list[str], p: int = 10
) -> DataFrame:
    """One HLL register table per group key — the per-dimension-cell
    sketch a rollup store keeps (≤ 2^p rows per cell, mergeable up the
    dimension hierarchy by per-bucket max; see ``hll_merge``).

    Scale shape: same single map-side-combined groupBy as the global
    sketch, keyed on (group, bucket)."""
    bits = 32 - p
    hv = hash64(cols)
    notnull = df
    for c in cols:
        notnull = notnull.filter(F.col(c).isNotNull())
    w = (hv % F.lit(1 << bits)).alias("w")
    rho = F.when(F.col("w") == 0, F.lit(bits + 1)).otherwise(
        F.lit(bits + 1) - F.length(F.bin(F.col("w")))
    )
    return (
        fan_out(notnull, bytes_per_task=FAN_OUT_CHEAP_MAP_BPT)
        .select(*group_cols, F.shiftright(hv, bits).cast("int").alias("bucket"), w)
        .select(*group_cols, "bucket", rho.cast("int").alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").cast("int").alias("register"))
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Union of HLL sketches: per-bucket max over all inputs — exactly
    the register table of the concatenated inputs, because max is
    associative and commutative. Control-plane sized (≤ 2^p rows each)."""
    merged = register_tables[0]
    for t in register_tables[1:]:
        merged = merged.unionByName(t)
    return merged.groupBy("bucket").agg(
        F.max("register").cast("int").alias("register")
    )


def hll_estimate(registers: DataFrame, p: int = 10) -> DataFrame:
    """One-row cardinality estimate from an HLL register table.

    The harmonic mean is computed in EXACT integer arithmetic: each
    register r contributes 2^(bits+1-r) (an integer, since
    r <= bits+1), absent buckets contribute 2^(bits+1), so
    ``sum_scaled`` = 2^(bits+1) * sum_j 2^(-M_j) is a BIGINT — immune to
    float summation-order drift across engines. The raw estimate
    alpha·m²/Z then needs ONE double division; the small-range
    (linear counting, E <= 5m/2 with empty buckets) and large-range
    (32-bit hash saturation) corrections pass their ln() through
    DECIMAL(18,8) so a last-ulp libm difference cannot change the hash.

    Output: ``m``, ``zero_buckets``, ``sum_scaled``, ``est_distinct``."""
    return hll_estimate_by_group(registers, [], p)


def hll_estimate_by_group(
    registers: DataFrame, group_cols: list[str], p: int = 10
) -> DataFrame:
    """``hll_estimate`` per group key — one estimate row per dimension
    cell from a (group..., bucket, register) table, the read side of the
    per-cell rollup sketches ``hll_registers_by_group`` writes. Same
    exact-integer harmonic sum and correction ladder as the global
    estimate (which delegates here with ``group_cols=[]``)."""
    bits = 32 - p
    m = 1 << p
    scale2 = 1 << (bits + 1)
    alpha_m2s = _hll_alpha(m) * float(m) * float(m) * float(scale2)
    two32 = float(1 << 32)
    grouped = (
        registers.groupBy(*group_cols) if group_cols else registers.groupBy()
    )
    agg = grouped.agg(
        F.count(F.lit(1)).cast("long").alias("filled"),
        F.sum(
            F.pow(F.lit(2.0), (F.lit(bits + 1) - F.col("register"))).cast("long")
        ).cast("long")
        .alias("filled_sum"),
    ).select(
        *group_cols,
        F.lit(m).cast("long").alias("m"),
        (F.lit(m) - F.col("filled")).cast("long").alias("zero_buckets"),
        (
            F.coalesce(F.col("filled_sum"), F.lit(0))
            + (F.lit(m) - F.col("filled")) * F.lit(scale2)
        ).cast("long").alias("sum_scaled"),
    )
    e_raw = F.lit(alpha_m2s) / F.col("sum_scaled").cast("double")
    ln_small = F.log(
        F.lit(float(m)) / F.col("zero_buckets").cast("double")
    )
    ln_large = F.log(F.lit(1.0) - e_raw / F.lit(two32))
    # Branch totality at saturation: with p=10 the raw estimate can
    # exceed 2^32 (min sum_scaled = m), where ln(1 - e/2^32) has a
    # NON-POSITIVE argument — Spark's log would yield NULL while DuckDB
    # RAISES, breaking the cross-engine contract exactly in the
    # correction branch. Clamp e_raw >= 2^32 to the SENTINEL 2^32
    # (the hash space is exhausted; no finite estimate is meaningful —
    # the sentinel marks "beyond 32-bit domain", and is deliberately a
    # constant, so it can sit below large-branch outputs),
    # and quantize the large branch through DECIMAL(28,8) — its output
    # tops out near 3e12 (ln of the smallest positive double), which
    # overflows DECIMAL(18,8)'s 1e10 cap NULL-vs-raise inconsistently.
    est = (
        F.when(
            (e_raw <= F.lit(2.5 * m)) & (F.col("zero_buckets") > 0),
            (F.lit(float(m)) * ln_small).cast("decimal(18,8)").cast("double"),
        )
        .when(e_raw >= F.lit(two32), F.lit(two32))
        .when(
            e_raw > F.lit(two32 / 30.0),
            (F.lit(-two32) * ln_large).cast("decimal(28,8)").cast("double"),
        )
        .otherwise(e_raw)
    )
    return agg.select(
        *group_cols, "m", "zero_buckets", "sum_scaled", est.alias("est_distinct")
    )


def hll_registers_sql(
    inner: str, value_expr: str | list[str], p: int = 10
) -> str:
    """DuckDB twin of ``hll_registers``: same md5-prefix hash, same
    shift/mod bucket split, same bin()-length rho. ``inner`` must already
    exclude NULL values of the hashed columns.

    ``value_expr`` as a LIST of column names mirrors the Spark side's
    multi-column key exactly (``concat_ws('|', CAST(c AS VARCHAR)...)``
    — the ``hash64`` preimage). A plain string is hashed as
    ``md5(CAST(expr AS VARCHAR))``, which matches ``hash64([col])`` for
    a SINGLE column only; a caller sketching multiple columns must pass
    the list form (or the concat_ws equivalent), otherwise the two
    engines' registers silently diverge."""
    bits = 32 - p
    mask = 1 << bits
    if isinstance(value_expr, list):
        casts = ", ".join(f"CAST({c} AS VARCHAR)" for c in value_expr)
        preimage = f"concat_ws('|', {casts})"
    else:
        preimage = f"CAST({value_expr} AS VARCHAR)"
    hv = f"('0x' || substring(md5({preimage}), 1, 8))::BIGINT"
    return f"""
      SELECT CAST(hv // {mask} AS INTEGER) AS bucket,
             CAST(max(CASE WHEN hv % {mask} = 0 THEN {bits + 1}
                           ELSE {bits + 1} - length(bin(hv % {mask}))
                      END) AS INTEGER) AS register
      FROM (SELECT {hv} AS hv FROM ({inner}))
      GROUP BY 1
    """


def hll_agg_sql(registers_rel: str, p: int = 10) -> str:
    """SELECT text computing (m, zero_buckets, sum_scaled) from a
    register relation — the exact-integer harmonic-sum step of
    ``hll_estimate`` in the DuckDB dialect."""
    m = 1 << p
    bits = 32 - p
    scale2 = 1 << (bits + 1)
    return f"""
        SELECT CAST({m} AS BIGINT) AS m,
               CAST({m} - count(*) AS BIGINT) AS zero_buckets,
               CAST(COALESCE(CAST(sum(CAST(2.0 ** ({bits + 1} - register) AS BIGINT)) AS BIGINT), 0)
                    + ({m} - count(*)) * {scale2} AS BIGINT) AS sum_scaled
        FROM {registers_rel}"""


def hll_est_expr_sql(p: int = 10) -> str:
    """The ``est_distinct`` CASE expression over (zero_buckets,
    sum_scaled) columns — constants embedded from the same Python doubles
    the Spark plan uses, ln() quantized through DECIMAL(18,8)."""
    m = 1 << p
    bits = 32 - p
    scale2 = 1 << (bits + 1)
    alpha_m2s = _hll_alpha(m) * float(m) * float(m) * float(scale2)
    two32 = float(1 << 32)
    return f"""CASE
               WHEN ({alpha_m2s!r} / CAST(sum_scaled AS DOUBLE)) <= {2.5 * m!r}
                    AND zero_buckets > 0
                 THEN CAST(CAST({float(m)!r} * ln({float(m)!r} / CAST(zero_buckets AS DOUBLE))
                           AS DECIMAL(18,8)) AS DOUBLE)
               WHEN ({alpha_m2s!r} / CAST(sum_scaled AS DOUBLE)) >= {two32!r}
                 THEN {two32!r}
               WHEN ({alpha_m2s!r} / CAST(sum_scaled AS DOUBLE)) > {two32 / 30.0!r}
                 THEN CAST(CAST({-two32!r} * ln(1.0 - ({alpha_m2s!r} / CAST(sum_scaled AS DOUBLE)) / {two32!r})
                           AS DECIMAL(28,8)) AS DOUBLE)
               ELSE {alpha_m2s!r} / CAST(sum_scaled AS DOUBLE)
             END"""


def hll_estimate_sql(registers_sql: str, p: int = 10) -> str:
    """DuckDB twin of ``hll_estimate`` over a registers subquery with
    (bucket, register) columns — one composed WITH, columns
    (m, zero_buckets, sum_scaled, est_distinct)."""
    return f"""
      WITH __reg AS ({registers_sql}),
      __agg AS ({hll_agg_sql('__reg', p)})
      SELECT m, zero_buckets, sum_scaled,
             {hll_est_expr_sql(p)} AS est_distinct
      FROM __agg
    """
