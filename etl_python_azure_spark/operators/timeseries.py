"""Time-series repair over event-derived daily series.

Gap-filling with a zero default lives in ``daily_activity_gapfill``
(queries/events.py); this module adds VALUE reconstruction — linear
interpolation across missing days — the preprocessing step for
per-entity metric series feeding forecasting / anomaly models.

Scale shape: one spine explode (per-entity day range), one window
per direction over (entity, day) — the same sort-once layout every
window op here shares. No driver state, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_compact(
    obs: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Collapse an observation stream into SCD Type-2 validity
    intervals (the warehouse-side twin of the reference's CDC upsert,
    `S:209–227`, which keeps only the LATEST version — this keeps
    them all).

    *obs* holds (key, ts, attrs...) observation rows. Consecutive
    observations (per key, ordered by ts then *tiebreak_col*) with
    identical attribute values merge into one version row:

        (key, version, attrs..., valid_from, valid_to, n_obs)

    ``version`` numbers runs 1..n per key; ``valid_to`` is the next
    version's ``valid_from`` (NULL for the current/open version) —
    the standard half-open [valid_from, valid_to) convention.

    Scale shape: one shuffle on *key_col*, two window passes over the
    same (key, ts) sort order, one hash aggregate. Change detection
    is null-safe (``<=>``) so NULL attribute observations form their
    own runs rather than merging with everything.
    """
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    # a key's first observation ALWAYS opens version 1 — without the
    # row_number anchor, a leading NULL attribute would null-safe-
    # equal the lag's no-previous-row NULL and start at version 0
    changed = F.row_number().over(w) == 1
    for a in attr_cols:
        changed = changed | ~F.lag(a).over(w).eqNullSafe(F.col(a))
    versioned = obs.withColumn(
        "version",
        F.sum(F.when(changed, 1).otherwise(0))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long"),
    )
    runs = versioned.groupBy(key_col, "version", *attr_cols).agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_obs"),
    )
    w_v = Window.partitionBy(key_col).orderBy("version")
    return runs.select(
        key_col,
        "version",
        *attr_cols,
        "valid_from",
        F.lead("valid_from").over(w_v).alias("valid_to"),
        "n_obs",
    )


def linear_interpolate_gaps(
    daily: DataFrame,
    key_col: str = "user_id",
    day_col: str = "day",
    val_col: str = "v",
) -> DataFrame:
    """Fill missing days of a per-key daily series by linear
    interpolation between the nearest observed values.

    *daily* holds observed rows only: (key, day DATE, value). The
    output has one row per key per day between that key's first and
    last observation: observed values pass through; interior gaps
    get ``prev + (next - prev) * elapsed/gap_len`` (exact double
    arithmetic in that fixed order); there are no leading/trailing
    gaps by construction of the spine.

    Output: (key, day, v_filled, is_interpolated).
    """
    spine = (
        daily.groupBy(key_col)
        .agg(F.min(day_col).alias("__lo"), F.max(day_col).alias("__hi"))
        .select(
            key_col,
            F.explode(F.sequence("__lo", "__hi")).alias(day_col),
        )
    )
    j = spine.join(daily, [key_col, day_col], "left")

    w_prev = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_v = F.last(val_col, ignorenulls=True).over(w_prev)
    prev_d = F.last(
        F.when(F.col(val_col).isNotNull(), F.col(day_col)), ignorenulls=True
    ).over(w_prev)
    next_v = F.first(val_col, ignorenulls=True).over(w_next)
    next_d = F.first(
        F.when(F.col(val_col).isNotNull(), F.col(day_col)), ignorenulls=True
    ).over(w_next)

    gap_len = F.datediff(next_d, prev_d).cast("double")
    elapsed = F.datediff(F.col(day_col), prev_d).cast("double")
    interp = prev_v + (next_v - prev_v) * (elapsed / gap_len)
    return j.select(
        key_col,
        day_col,
        F.when(F.col(val_col).isNotNull(), F.col(val_col))
        .otherwise(interp)
        .alias("v_filled"),
        F.col(val_col).isNull().alias("is_interpolated"),
    )


def ewma_halflife(
    daily: DataFrame,
    key_col: str = "user_id",
    day_col: str = "day",
    val_col: str = "v",
    max_len: int = 100,
) -> DataFrame:
    """Exponentially-weighted moving average with decay 1/2 per
    OBSERVATION (``s_t = (v_t + s_{t-1}) / 2``) — the trend feature
    for per-entity metric series.

    EWMA is a sequential recursion, which neither SQL engine can run
    row-by-row — but with a power-of-two decay it unrolls exactly:

        s_r = 0.5^(r+1) * Σ_{i≤r} 2^i * v_i      (r = row number)

    ``2^i * cents_i`` is an exact integer (DECIMAL(38,0)), its
    running sum is order-free, and the final ``0.5^(r+1)`` rescale is
    an exact binary shift — so the whole trajectory is deterministic
    and bit-replayable by the DuckDB oracle, like the PageRank loop.

    The unroll costs magnitude: 2^i * cents must fit DECIMAL(38,0),
    which bounds per-key series at ~*max_len* ≈ 100 observations
    (2^100·10⁶ ≈ 1.3e36). Callers with longer series window or
    re-chunk first; the operator fails loudly (ANSI overflow) rather
    than decaying silently. At 100 TB this is one shuffle on the key
    and one cumulative window over (key, day) — no state, no UDFs.

    Output: (key, day, v, ewma).
    """
    if max_len > 100:
        raise ValueError("2^i overflows DECIMAL(38,0) beyond ~100 rows")
    w_rn = Window.partitionBy(key_col).orderBy(day_col)
    r = F.row_number().over(w_rn)
    cents = F.floor(F.col(val_col) * F.lit(100)).cast("decimal(38,0)")
    wgt = F.pow(F.lit(2.0), r.cast("double")).cast("decimal(38,0)")
    staged = daily.select(
        key_col,
        day_col,
        F.col(val_col).alias("v"),
        r.alias("__r"),
        (cents * wgt).alias("__w"),
    )
    acc = F.sum("__w").over(
        Window.partitionBy(key_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ewma = (
        acc.cast("string").cast("double")
        * F.pow(F.lit(0.5), (F.col("__r") + F.lit(1)).cast("double"))
    ) / F.lit(100.0)
    return staged.select(
        key_col, day_col, "v", ewma.alias("ewma")
    )


def znorm_series(
    daily: DataFrame,
    key_col: str = "user_id",
    day_col: str = "day",
    val_col: str = "v",
) -> DataFrame:
    """Align per-key daily series on the GLOBAL day spine (gap days
    filled with 0), then z-normalize per key with exact fixed-point
    moments (the `event_value_outliers` discipline) — the shared
    preprocessing for time-series similarity search.

    Keys with zero variance (constant series) are dropped — they
    have no shape to match. Output: (key, idx, z, n) with idx the
    0-based position on the spine.
    """
    bounds = daily.agg(
        F.min(day_col).alias("__lo"), F.max(day_col).alias("__hi")
    )
    spine = (
        daily.select(key_col)
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            key_col,
            F.explode(F.sequence("__lo", "__hi")).alias(day_col),
        )
    )
    filled = spine.join(daily, [key_col, day_col], "left").select(
        key_col,
        day_col,
        F.floor(F.coalesce(val_col, F.lit(0.0)) * F.lit(100))
        .alias("cents"),
    )
    n = F.count(F.lit(1))
    sum_c = F.sum(F.col("cents").cast("decimal(38,0)")).cast("double")
    cents_dec = F.col("cents").cast("decimal(38,0)")
    sum_c2 = F.sum(cents_dec * cents_dec).cast("double")
    mu = sum_c / n.cast("double")
    stats = filled.groupBy(key_col).agg(
        n.alias("n"),
        mu.alias("mu"),
        F.sqrt((sum_c2 / n.cast("double")) - (mu * mu)).alias("sigma"),
    )
    w = Window.partitionBy(key_col).orderBy(day_col)
    return (
        filled.join(F.broadcast(stats.filter(F.col("sigma") > 0)), key_col)
        .select(
            key_col,
            (F.row_number().over(w) - 1).alias("idx"),
            (
                (F.col("cents").cast("double") - F.col("mu"))
                / F.col("sigma")
            ).alias("z"),
            "n",
        )
    )


def sax_words(
    z: DataFrame,
    key_col: str = "user_id",
    segments: int = 6,
) -> DataFrame:
    """PAA + SAX signature per key: segment means of the z-series
    (exact fixed-point, so the symbols are engine-independent)
    discretized on the standard 4-symbol Gaussian breakpoints
    (−0.6745, 0, 0.6745) and concatenated in segment order.

    The word is the BLOCK KEY for similarity search — iSAX-style
    lower-bound blocking: similar shapes share a word, so the
    pairwise join runs per block, never over all key pairs.
    Output: (key, word).
    """
    # explicit floor: DuckDB's double→int CAST rounds half-even,
    # Spark's truncates — floor() agrees everywhere
    seg = F.expr(f"CAST(floor(idx * {segments} / n) AS INT)")
    segmu = (
        F.sum(F.floor(F.col("z") * F.lit(1e10)).cast("decimal(38,0)"))
        .cast("double")
        / (F.count(F.lit(1)).cast("double") * F.lit(1e10))
    )
    sym = (
        F.when(F.col("segmu") < -0.6745, "a")
        .when(F.col("segmu") < 0.0, "b")
        .when(F.col("segmu") < 0.6745, "c")
        .otherwise("d")
    )
    paa = z.groupBy(key_col, seg.alias("seg")).agg(segmu.alias("segmu"))
    return (
        paa.select(key_col, "seg", sym.alias("sym"))
        .groupBy(key_col)
        .agg(
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("seg", "sym"))
                    ),
                    lambda s: s["sym"],
                ),
            ).alias("word")
        )
    )


def ts_similarity_pairs(
    z: DataFrame,
    blocks: DataFrame | None = None,
    key_col: str = "user_id",
) -> DataFrame:
    """Exact z-normalized squared Euclidean distance between key
    pairs — restricted to same-SAX-word *blocks* when given (the
    scale path: cost ∝ collisions), else all pairs (the small-N
    ground-truth verifier, `ann_bruteforce_topk`-style).

    Per-position terms are floor-quantized to an 1e-12 grid before
    summing, so the distance is aggregation-order-free and
    SQL-replayable. Output: (key_a, key_b, dist) — unordered pairs.
    """
    a = z.select(
        F.col(key_col).alias("key_a"), "idx", F.col("z").alias("za")
    )
    b = z.select(
        F.col(key_col).alias("key_b"), "idx", F.col("z").alias("zb")
    )
    if blocks is not None:
        pairs = (
            blocks.alias("x")
            .join(blocks.alias("y"), "word")
            .filter(F.col(f"x.{key_col}") < F.col(f"y.{key_col}"))
            .select(
                F.col(f"x.{key_col}").alias("key_a"),
                F.col(f"y.{key_col}").alias("key_b"),
            )
        )
        a = a.join(pairs.select("key_a").distinct(), "key_a")
        joined = a.join(pairs, "key_a").join(
            b, ["key_b", "idx"]
        )
    else:
        joined = a.join(b, "idx").filter(F.col("key_a") < F.col("key_b"))
    diff = F.col("za") - F.col("zb")
    return (
        joined.groupBy("key_a", "key_b")
        .agg(
            (
                F.sum(
                    F.floor(diff * diff * F.lit(1e12)).cast(
                        "decimal(38,0)"
                    )
                ).cast("double")
                / F.lit(1e12)
            ).alias("dist")
        )
    )


def ohlc_bars(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    bucket: Column | None = None,
) -> DataFrame:
    """Resample an observation stream into OHLC bars — the canonical
    time-series downsampling (finance candles; equally the shape of
    "first/last/extreme reading per device-hour" telemetry rollups).

    One hash aggregate per (key..., bucket): ``open``/``close`` via
    ``min_by``/``max_by`` over the (ts, tiebreak) struct — the
    single-pass, shuffle-once idiom for first/last-per-group at scale
    (no window sort of the full stream); ``high``/``low``/``n_obs``
    are plain aggregates. *tiebreak_col* must make (ts, tiebreak)
    unique per key so the result is deterministic under any
    partitioning. *bucket* defaults to the calendar day of *ts*.
    """
    b = (bucket if bucket is not None else F.to_date(F.col(ts_col))).alias(
        "bucket"
    )
    return df.groupBy(*[F.col(c) for c in key_cols], b).agg(
        F.expr(
            f"min_by({value_col}, struct({ts_col}, {tiebreak_col}))"
        ).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.expr(
            f"max_by({value_col}, struct({ts_col}, {tiebreak_col}))"
        ).alias("close"),
        F.count(F.lit(1)).alias("n_obs"),
    )


def seasonal_mase(
    daily: DataFrame,
    group_col: str = "event_type",
    date_col: str = "day",
    value_col: str = "total",
    season_lag: int = 7,
) -> DataFrame:
    """MASE-style error of the SEASONAL-NAIVE forecast (value
    *season_lag* rows back) against the one-step-naive baseline
    (previous row) per group — the standard "is there weekly
    seasonality worth modeling?" screen on a daily metric.

    *daily* must be one row per (group, date); lags are over the
    date ordering (missing days simply widen a step, the usual
    operational simplification — run the spine/interpolation repair
    first if exact calendar lags matter). Scores only rows where
    BOTH forecasts exist, so the two MAEs cover the identical day
    set and their ratio is meaningful.

    Determinism: each |error| is floor-quantized to the 1e-8 grid
    and integer-summed (order-free, SQL-replayable — the PageRank/
    ADC discipline); `mase` is one double division of the two sums.
    mase < 1 ⇒ the seasonal forecast beats naive ⇒ the seasonality
    is real. Output: (group, n_scored_days, seasonal_mae, naive_mae,
    mase).

    One sort-once window per group — no shuffle beyond the
    (group)-keyed exchange; group count bounds the state.
    """
    w = Window.partitionBy(group_col).orderBy(date_col)
    v = F.col(value_col)
    err_s = F.abs(v - F.lag(value_col, season_lag).over(w))
    err_n = F.abs(v - F.lag(value_col, 1).over(w))
    scored = daily.select(
        group_col,
        F.floor(err_s * F.lit(1e8)).cast("decimal(38,0)").alias("__qs"),
        F.floor(err_n * F.lit(1e8)).cast("decimal(38,0)").alias("__qn"),
    ).filter(F.col("__qs").isNotNull() & F.col("__qn").isNotNull())
    agg = scored.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_scored_days"),
        (F.sum("__qs").cast("double") / F.lit(1e8)).alias("__ss"),
        (F.sum("__qn").cast("double") / F.lit(1e8)).alias("__sn"),
    )
    n = F.col("n_scored_days").cast("double")
    return agg.select(
        group_col,
        "n_scored_days",
        (F.col("__ss") / n).alias("seasonal_mae"),
        (F.col("__sn") / n).alias("naive_mae"),
        # NULL when the naive-error sum is zero (flat series): under
        # ANSI mode a bare division would throw DIVIDE_BY_ZERO, and
        # the oracle's CASE WHEN SUM(qn) <> 0 returns NULL there.
        F.when(F.col("__sn") != 0, F.col("__ss") / F.col("__sn")).alias(
            "mase"
        ),
    )


def cusum_changepoint(
    df: DataFrame,
    group_col: str,
    time_col: str,
    value_col: str,
    scale: float = 1e8,
) -> DataFrame:
    """Single-changepoint estimate per group via the classic CUSUM
    statistic: S_t = Σ_{i≤t}(x_i − x̄); the estimated change time is
    argmax_t |S_t| (earliest time on ties) — the screening pass that
    flags WHERE a level shift happened before a model is fit.

    Determinism across engines: values are floor-quantized to
    1e-8 integers up front, the running sum and total are EXACT
    integer window sums, and the only doubles are μ = Q/n and
    S_t = (cum_t − t·μ)/scale — the same IEEE ops in both engines,
    so the argmax ordering can't diverge. Per-group windows sort one
    partition per key (series length = days per group — bounded);
    nothing crosses groups, no driver state.

    Output: (group_col, n_points, cp_time, cusum_at_cp, mean_before,
    mean_after); mean_after is NULL when the argmax lands on the last
    point.
    """
    q = F.floor(F.col(value_col).cast("double") * F.lit(scale)).cast(
        "long"
    )
    w_ord = (
        Window.partitionBy(group_col)
        .orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(group_col)
    staged = df.select(
        group_col,
        time_col,
        q.alias("__q"),
    ).select(
        group_col,
        time_col,
        F.sum("__q").over(w_ord).alias("__cq"),
        F.row_number()
        .over(Window.partitionBy(group_col).orderBy(time_col))
        .alias("__t"),
        F.sum("__q").over(w_all).alias("__tot"),
        F.count(F.lit(1)).over(w_all).alias("__n"),
    )
    mu = F.col("__tot").cast("double") / F.col("__n").cast("double")
    s = (
        F.col("__cq").cast("double") - F.col("__t").cast("double") * mu
    ) / F.lit(scale)
    scored = staged.withColumn("__s", s)
    pick = Window.partitionBy(group_col).orderBy(
        F.desc(F.abs(F.col("__s"))), F.asc(time_col)
    )
    top = scored.withColumn("__rk", F.row_number().over(pick)).filter(
        F.col("__rk") == 1
    )
    mean_before = F.col("__cq").cast("double") / (
        F.col("__t").cast("double") * F.lit(scale)
    )
    mean_after = F.when(
        F.col("__n") > F.col("__t"),
        (F.col("__tot") - F.col("__cq")).cast("double")
        / ((F.col("__n") - F.col("__t")).cast("double") * F.lit(scale)),
    )
    return top.select(
        group_col,
        F.col("__n").cast("long").alias("n_points"),
        F.col(time_col).alias("cp_time"),
        F.col("__s").alias("cusum_at_cp"),
        mean_before.alias("mean_before"),
        mean_after.alias("mean_after"),
    )
