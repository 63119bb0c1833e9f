"""Windowed temporal operators (north_rule): lag/lead, forward/backward fill,
gap sessionize, rolling (voxel-mode analog) features.

All pure DataFrame window functions (SURVEY.md §2.5) — JVM-side, one shuffle
on the entity key, whole-stage codegen. Leakage discipline: every "past"
operator uses frames ending at the current row; ``bfill`` is the only
future-looking op and is therefore excluded from feature cuts (enforced by
``leakage.audit_cut`` + the as-of direction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _keys(on) -> list:
    return [on] if isinstance(on, str) else list(on)


def _epoch(col):
    # TIMESTAMP_NTZ-safe seconds since epoch (session tz = UTC)
    return F.col(col).cast("timestamp").cast("double")


def with_lag_lead(
    df: DataFrame, on, order_by, cols, offsets=(1,), prefix: str = ""
) -> DataFrame:
    """Add lag/lead columns: ``{prefix}{col}_lag{k}`` / ``_lead{k}``."""
    w = Window.partitionBy(*_keys(on)).orderBy(*_keys(order_by))
    out = df
    for c in _keys(cols):
        for k in offsets:
            out = out.withColumn(f"{prefix}{c}_lag{k}", F.lag(c, k).over(w))
            out = out.withColumn(f"{prefix}{c}_lead{k}", F.lead(c, k).over(w))
    return out


def ffill(df: DataFrame, on, order_by, cols) -> DataFrame:
    """Forward-fill nulls from the past only (leakage-safe)."""
    w = (
        Window.partitionBy(*_keys(on))
        .orderBy(*_keys(order_by))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in _keys(cols):
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def bfill(df: DataFrame, on, order_by, cols) -> DataFrame:
    """Backward-fill nulls from the future. FUTURE-LOOKING: must only be
    applied within an already-cut window (never before an as-of feature cut —
    SURVEY.md §2.5 note)."""
    w = (
        Window.partitionBy(*_keys(on))
        .orderBy(*_keys(order_by))
        .rowsBetween(0, Window.unboundedFollowing)
    )
    out = df
    for c in _keys(cols):
        out = out.withColumn(c, F.first(c, ignorenulls=True).over(w))
    return out


def sessionize(
    df: DataFrame, on, ts_col: str, gap_seconds: float, session_col: str = "session_id"
) -> DataFrame:
    """Gap-based sessionize: new session when the gap to the previous event
    exceeds ``gap_seconds``. Classic gaps-and-islands (SURVEY.md §2.5);
    session ids are 1-based per entity."""
    keys = _keys(on)
    w = Window.partitionBy(*keys).orderBy(ts_col)
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    prev = F.lag(ts_col, 1).over(w)
    new_sess = F.when(
        prev.isNull() | ((_epoch(ts_col) - prev.cast("timestamp").cast("double")) > gap_seconds),
        1,
    ).otherwise(0)
    return df.withColumn(session_col, F.sum(new_sess).over(cum))


def session_bounds(
    df: DataFrame, on, ts_col: str, gap_seconds: float
) -> DataFrame:
    """Per-session aggregate: start/end/duration/event count."""
    keys = _keys(on)
    s = sessionize(df, on, ts_col, gap_seconds)
    return s.groupBy(*keys, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            F.max(_epoch(ts_col)) - F.min(_epoch(ts_col))
        ).alias("duration_seconds"),
        F.count("*").alias("n_events"),
    )


def rolling_firstorder(
    df: DataFrame,
    on,
    order_by,
    value_col: str,
    radius: int,
    prefix: str = "roll_",
) -> DataFrame:
    """Voxel-mode analog (reference base.py:200-245): per-position rolling
    first-order stats over frame rowsBetween(-radius, +radius). Pure window
    aggregates — no Python."""
    w = (
        Window.partitionBy(*_keys(on))
        .orderBy(*_keys(order_by))
        .rowsBetween(-radius, radius)
    )
    v = F.col(value_col)
    return (
        df.withColumn(f"{prefix}mean", F.avg(v).over(w))
        .withColumn(f"{prefix}min", F.min(v).over(w))
        .withColumn(f"{prefix}max", F.max(v).over(w))
        .withColumn(f"{prefix}sum", F.sum(v).over(w))
        .withColumn(f"{prefix}count", F.count(v).over(w))
        .withColumn(f"{prefix}var", F.coalesce(F.var_pop(v).over(w), F.lit(0.0)))
        .withColumn(f"{prefix}energy", F.sum(v * v).over(w))
        .withColumn(
            f"{prefix}range", F.max(v).over(w) - F.min(v).over(w)
        )
    )


def ngtdm_window(
    df: DataFrame, on, order_by, level_col: str, radius: int = 1
) -> DataFrame:
    """NGTDM neighborhood terms as window ops (SURVEY §2.4 NGTDM row):
    per-position neighbor mean excluding self = (sum − level)/(cnt − 1);
    emits ``nbr_mean`` and ``abs_diff`` (NaN-safe when no neighbors)."""
    w = (
        Window.partitionBy(*_keys(on))
        .orderBy(*_keys(order_by))
        .rowsBetween(-radius, radius)
    )
    v = F.col(level_col)
    s = F.sum(v).over(w)
    c = F.count(v).over(w)
    nbr_mean = F.when(c > 1, (s - v) / (c - 1))
    return df.withColumn("nbr_mean", nbr_mean).withColumn(
        "abs_diff", F.abs(v - nbr_mean)
    )


def gldm_window(
    df: DataFrame, on, order_by, level_col: str, radius: int = 1, alpha: float = 0.0
) -> DataFrame:
    """GLDM dependence count as window ops: #neighbors within ±radius with
    |level − neighbor| ≤ α (self excluded)."""
    keys = _keys(on)
    order = _keys(order_by)
    w = Window.partitionBy(*keys).orderBy(*order)
    dep = F.lit(0)
    for k in range(1, radius + 1):
        for side in (F.lag, F.lead):
            nbr = side(level_col, k).over(w)
            dep = dep + F.when(
                nbr.isNotNull() & (F.abs(F.col(level_col) - nbr) <= alpha), 1
            ).otherwise(0)
    return df.withColumn("dependence", dep)


def rolling_median(
    df: DataFrame,
    on,
    order_by,
    value_col: str,
    radius: int,
    out_col: str = "roll_median",
    probs: tuple = (),
) -> DataFrame:
    """EXACT rolling median (and optional extra percentiles) over frame
    rowsBetween(-radius, +radius) — the robust twin of
    ``rolling_firstorder``'s mean, for spike-resistant temporal feature
    smoothing. Spark's ``percentile`` aggregate is exact with linear
    interpolation, the same convention as DuckDB/numpy, so the result is
    engine-reproducible (unlike ``percentile_approx``).

    Scale shape: one window per partition key, frame-bounded state (the
    2·radius+1 frame is re-sorted per row by the percentile aggregate —
    O(frame log frame) per row, fine for the small radii rolling features
    use; for radius ≫ 100 prefer rolling_firstorder's moments).
    """
    w = (
        Window.partitionBy(*_keys(on))
        .orderBy(*_keys(order_by))
        .rowsBetween(-radius, radius)
    )
    out = df.withColumn(
        out_col, F.expr(f"percentile({value_col}, 0.5)").over(w))
    for p in probs:
        out = out.withColumn(
            f"{out_col}_p{int(round(p * 100))}",
            F.expr(f"percentile({value_col}, {p!r})").over(w))
    return out


def decayed_features(
    df: DataFrame,
    on,
    ts_col: str,
    value_col: str,
    half_life: float,
    horizon: float | None = None,
    prefix: str = "decayed_",
) -> DataFrame:
    """Exponentially time-decayed point-in-time features per entity: at
    each event, ``{prefix}sum`` = Σ over all prior-or-equal events of
    ``value · 2^(−Δt/half_life)`` and ``{prefix}count`` = the same with
    value≡1 (the classic leakage-free recency features — "decayed spend",
    "decayed activity"). ``horizon`` (seconds) bounds the lookback to a
    RANGE frame; None means all history.

    Implementation: the decayed sum factors as
    ``e^{−λ(t−t₀)} · Σ v_i e^{λ(t_i−t₀)}`` with λ = ln2/half_life and t₀
    the per-entity min timestamp, so the Σ is an ordinary cumulative /
    range-frame window sum — pure JVM window aggregates, no recursion,
    no Python, no self-join. Rows with equal timestamps are RANGE-frame
    peers: they share the full tie group's sum in both engines (ties are
    simultaneous events — no intra-tie ordering is defensible).

    Numerics: exponents are rebased per entity, so overflow needs
    λ·(entity time span) > ~700 — a half-life of 1 day allows ~2.7 years
    of per-entity history; longer spans need a longer half-life or a
    chunked rebase (raise at the call site, not silently inf). Spark and
    DuckDB both evaluate exp in IEEE doubles; cross-engine noise is ulp-
    scale and absorbed by the gate's 1e-6 rounding.

    Scale shape: two window passes over one entity-partitioned sort
    (min-rebase, then the framed sum) — the same single shuffle the
    downstream lag/lead features already pay; reusing the partitioning
    means Catalyst plans ONE Exchange for the whole feature block.
    """
    import math

    lam = math.log(2.0) / float(half_life)
    t = _epoch(ts_col)
    went = Window.partitionBy(*_keys(on))
    t0 = F.min(t).over(went)
    if horizon is None:
        lo = Window.unboundedPreceding
    else:
        # the DataFrame rangeBetween API takes long bounds — whole seconds
        if float(horizon) != int(horizon):
            raise ValueError("horizon must be whole seconds")
        lo = -int(horizon)
    w = (
        Window.partitionBy(*_keys(on))
        .orderBy(t)
        .rangeBetween(lo, 0)
    )
    rebased = F.exp(F.lit(lam) * (t - t0))
    decay_now = F.exp(-F.lit(lam) * (t - t0))
    v = F.col(value_col).cast("double")
    return (
        df.withColumn(f"{prefix}sum",
                      decay_now * F.sum(v * rebased).over(w))
        .withColumn(f"{prefix}count",
                    decay_now * F.sum(rebased).over(w))
    )


def ohlc_bars(
    df: DataFrame,
    on,
    ts_col: str,
    value_col: str,
    width: float,
) -> DataFrame:
    """Fixed-width summary bars per entity — open/high/low/close/n over
    ``width``-second epoch buckets, the time-series downsampling step
    before windowed features (the numeric analog of tumbling counts).
    Open/close are argmin/argmax by time with DETERMINISTIC tie-breaks:
    equal-timestamp ties resolve to the smaller value for open and the
    larger for close (min/max over a (ts, value) struct — a total order,
    unlike arg_min/arg_max whose ties are arrival-order).

    Scale shape: ONE map-side-combined groupBy (entity, bucket) — no
    per-entity ordered window, so a hot entity costs a bigger partial
    aggregate, never a single-task sort."""
    keys = _keys(on)
    t = _epoch(ts_col)
    b = F.floor(t / F.lit(float(width))).cast("long")
    v = F.col(value_col)
    return (
        df.select(*keys, b.alias("bucket"), t.alias("__t"), v.alias("__v"))
        .groupBy(*keys, "bucket")
        .agg(
            F.min(F.struct(F.col("__t"), F.col("__v")))["__v"]
            .alias("open"),
            F.max("__v").alias("high"),
            F.min("__v").alias("low"),
            F.max(F.struct(F.col("__t"), F.col("__v")))["__v"]
            .alias("close"),
            F.count("*").alias("n"),
        )
    )


def resample_grid(
    df: DataFrame,
    on,
    ts_col: str,
    value_col: str,
    step: float,
    max_buckets: int = 100_000,
) -> DataFrame:
    """Regularize an irregular series: one row per entity per ``step``-
    second epoch bucket between that entity's first and last observation,
    carrying the bucket's LAST observation forward-filled across gaps
    (pandas ``asfreq`` + ``ffill``, the feature-store resample). Output
    (entity, bucket, value, observed: bool).

    Scale shape: per-entity (min, max, per-bucket-last) aggregates, ONE
    sequence-explode sized range/step per entity (guarded by
    ``max_buckets`` — a year at 1-minute steps is 525k rows per entity;
    fail fast instead of exploding a mis-parameterized grid), and the
    leakage-safe ffill window over GRID rows (bounded by the grid, not
    the raw event count)."""
    keys = _keys(on)
    t = _epoch(ts_col)
    b = F.floor(t / F.lit(float(step))).cast("long")
    v = F.col(value_col)
    obs = (
        df.select(*keys, b.alias("bucket"), t.alias("__t"), v.alias("__v"))
        .groupBy(*keys, "bucket")
        .agg(F.max(F.struct(F.col("__t"), F.col("__v")))["__v"]
             .alias("__last")))
    span = obs.groupBy(*keys).agg(
        F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi"))
    n_buckets = F.col("__hi") - F.col("__lo") + 1
    grid = span.select(
        *keys,
        F.explode(F.when(
            n_buckets <= max_buckets,
            F.sequence(F.col("__lo"), F.col("__hi"))).otherwise(
            F.raise_error(F.concat(
                F.lit("resample grid too large ("),
                n_buckets.cast("string"),
                F.lit(f" > {max_buckets} buckets); raise step or "
                      "max_buckets"))))).alias("bucket"))
    joined = grid.join(obs, keys + ["bucket"], "left").select(
        *keys, "bucket", F.col("__last").alias("value"),
        F.col("__last").isNotNull().alias("observed"))
    return ffill(joined, keys, ["bucket"], ["value"])


def scd2_compress(
    df: DataFrame,
    on,
    ts_col: str,
    attr_col: str,
    tie_col: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type-2 compression: collapse each
    entity's observation stream into maximal runs of an unchanged
    attribute, emitting one validity interval per run —

        (keys…, attr, valid_from, valid_to, n_events, is_current)

    with ``valid_to`` = the next run's ``valid_from`` (half-open
    [from, to) intervals, NULL on the current run). This is the ingest
    side of the point-in-time store: the as-of join (operators/asof.py)
    serves "attribute as of t" directly from these intervals without
    scanning the raw event history. Crawl analog: per-url language /
    template-version history across weekly snapshots.

    Scale shape: every step is a window over ONE partitioning — keys
    ordered by (ts, tie) — so the whole operator costs a single exchange
    + sort per entity key; run boundaries are lag()-detected, interval
    ends lead()-filled, and run lengths come from row_number deltas (no
    second groupBy shuffle, unlike the naive segment-id + groupBy form).
    ``tie_col`` makes run boundaries deterministic when timestamps
    collide (same discipline as asof deterministic_ties)."""
    keys = _keys(on)
    order = [F.col(ts_col)] + ([F.col(tie_col)] if tie_col else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(attr_col).over(w)
    # null-safe change detection: a run of NULL attributes is ONE run
    # (eqNullSafe), and the first row per key is always a run start
    # (row_number, not prev.isNull() — a NULL prev is ambiguous when the
    # attribute itself can be NULL)
    marked = df.select(
        *keys, ts_col, attr_col,
        F.row_number().over(w).alias("__rn"),
        F.count("*").over(Window.partitionBy(*keys)).alias("__tot"),
        (~prev.eqNullSafe(F.col(attr_col))).alias("__ne"),
    ).withColumn("__chg", (F.col("__rn") == 1) | F.col("__ne"))
    starts = marked.where(F.col("__chg"))
    ws = Window.partitionBy(*keys).orderBy("__rn")
    nxt_rn = F.lead("__rn").over(ws)
    return starts.select(
        *keys,
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(ws).alias("valid_to"),
        (F.coalesce(nxt_rn, F.col("__tot") + 1) - F.col("__rn"))
        .cast("long").alias("n_events"),
        F.lead(ts_col).over(ws).isNull().alias("is_current"),
    )


def autocorrelation(
    df: DataFrame,
    on,
    ts_col: str,
    value_col: str,
    lags=(1, 2, 3),
    tie_col: str | None = None,
) -> DataFrame:
    """Corpus autocorrelation function over per-entity ordered series:
    for each lag k, the Pearson correlation between x_t and x_{t−k}
    where the lag never crosses an entity boundary — (lag, n_pairs, r).
    The temporal-signal diagnostic (is yesterday's metric predictive?)
    that decides whether lag/decay features are worth materializing.

    Scale shape: ONE window partitioning (entity, ordered by ts + tie)
    produces every lagged pair column in a single pass, then ONE
    map-side-combined global aggregate computes the five Pearson sums
    per lag — no per-lag scans, no global sort, |lags|-row output. The
    correlation uses the explicit (Σxy − n·x̄·ȳ) form with one fixed
    operation tree so an oracle replays it exactly; r is NULL when a
    lag has < 2 pairs or zero variance."""
    keys = _keys(on)
    order = [F.col(ts_col)] + ([F.col(tie_col)] if tie_col else [])
    w = Window.partitionBy(*keys).orderBy(*order)
    x = F.col(value_col).cast("double")
    lagged = df.select(
        x.alias("__x"),
        *[F.lag(x, int(k)).over(w).alias(f"__l{k}") for k in lags])
    aggs = []
    for k in lags:
        y = F.col(f"__l{k}")
        pair = y.isNotNull()
        xx = F.when(pair, F.col("__x"))
        aggs += [
            F.count(y).alias(f"n{k}"),
            F.sum(xx).alias(f"sx{k}"), F.sum(y).alias(f"sy{k}"),
            F.sum(xx * xx).alias(f"sxx{k}"), F.sum(y * y).alias(f"syy{k}"),
            F.sum(xx * y).alias(f"sxy{k}"),
        ]
    g = lagged.agg(*aggs)
    parts = []
    for k in lags:
        n = F.col(f"n{k}").cast("double")
        sx, sy = F.col(f"sx{k}"), F.col(f"sy{k}")
        sxx, syy, sxy = F.col(f"sxx{k}"), F.col(f"syy{k}"), F.col(f"sxy{k}")
        cov = sxy - (sx * sy) / n
        vx = sxx - (sx * sx) / n
        vy = syy - (sy * sy) / n
        r = F.when((n >= 2) & (vx > 0) & (vy > 0),
                   cov / F.sqrt(vx * vy))
        parts.append(F.struct(
            F.lit(int(k)).alias("lag"),
            F.col(f"n{k}").alias("n_pairs"), r.alias("r")))
    return (g.select(F.explode(F.array(*parts)).alias("e"))
            .select("e.lag", "e.n_pairs", "e.r"))


def rolling_slope(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    window_rows: int = 8,
    tie_col: str | None = None,
    out_col: str = "slope",
) -> DataFrame:
    """Per-row OLS trend over the entity's trailing ``window_rows``
    observations: the regression slope of value on time across the ROWS
    frame ending at the current row — the standard local-trend feature
    (is this host's quality/traffic/latency drifting, and how fast?)
    that lag/delta features can't express when sampling is irregular.
    NULL until the frame holds ≥ 2 points or while time variance is 0.

    Computed as sufficient statistics — n, Σx, Σy, Σxy, Σxx as five
    aggregates over ONE shared window frame (one exchange + one sort
    per entity, the same partitioning every other temporal operator
    here uses), then ``slope = (nΣxy − ΣxΣy) / (nΣxx − (Σx)²)`` as a
    scalar expression. x is epoch seconds REBASED to the entity's
    minimum timestamp (a per-partition constant, so the shift is
    slope-invariant): raw epoch² magnitudes (~3e18) would eat all 52
    mantissa bits and make the denominator pure cancellation noise."""
    if window_rows < 2:
        raise ValueError("window_rows must be >= 2")
    order = [F.col(ts_col)] + ([F.col(tie_col)] if tie_col else [])
    x_raw = F.col(ts_col).cast("timestamp").cast("double") \
        if dict(df.dtypes).get(ts_col) != "double" else F.col(ts_col)
    base = df.withColumn(
        "__x0", x_raw - F.min(x_raw).over(Window.partitionBy(entity_col)))
    w = (Window.partitionBy(entity_col).orderBy(*order)
         .rowsBetween(-(window_rows - 1), 0))
    x = F.col("__x0")
    y = F.col(value_col).cast("double")
    n = F.count(y).over(w).cast("double")
    sx = F.sum(x).over(w)
    sy = F.sum(y).over(w)
    sxy = F.sum(x * y).over(w)
    sxx = F.sum(x * x).over(w)
    den = n * sxx - sx * sx
    slope = F.when((n >= 2) & (den > 0), (n * sxy - sx * sy) / den)
    return base.withColumn(out_col, slope).drop("__x0")


def cusum_changepoint(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    tie_col: str | None = None,
) -> DataFrame:
    """Per-entity CUSUM changepoint scan (Page 1954; the batch
    mean-shift form): running sum of deviations from the entity mean,
    ``S_i = Σ_{j≤i}(x_j − x̄)``; the changepoint estimate is the
    position maximizing |S_i| and the score is
    ``max|S_i| / (σ·√n)`` — the normalized statistic regime-shift
    monitors threshold (≳1.6 is the classic 5% line for a single
    scan). Output one row per entity: ``(entity, n, cp_ts, score)``,
    ties on |S| broken by earliest (ts, tie). NULL score when σ = 0
    (constant series — no changepoint definable).

    Scale shape: x̄ and σ as window aggregates over the FULL entity
    partition, the running sum over the same ordered partitioning (ONE
    exchange + sort total), then one per-entity argmax aggregate via
    max(struct) — no self-joins, no per-split scans (the O(n) CUSUM
    identity replaces the naive try-every-split O(n²))."""
    order = [F.col(ts_col)] + ([F.col(tie_col)] if tie_col else [])
    wp = Window.partitionBy(entity_col)
    wr = (Window.partitionBy(entity_col).orderBy(*order)
          .rowsBetween(Window.unboundedPreceding, 0))
    x = F.col(value_col).cast("double")
    n = F.count(x).over(wp).cast("double")
    mean = F.sum(x).over(wp) / n
    # population σ via E[x²]−E[x]² (one pass; exact fixed op tree)
    var = F.sum(x * x).over(wp) / n - mean * mean
    s = F.sum(x).over(wr) - F.row_number().over(
        Window.partitionBy(entity_col).orderBy(*order)) * mean
    scored = df.select(
        F.col(entity_col), F.col(ts_col).alias("__ts"),
        n.alias("__n"), var.alias("__var"), F.abs(s).alias("__as"),
        *([F.col(tie_col).alias("__tie")] if tie_col else []))
    # argmax by (|S| desc, ts asc[, tie asc]) via max(struct): negate
    # the time order inside the struct so max picks the earliest tie
    neg_ts = (-F.col("__ts").cast("timestamp").cast("double")
              if dict(df.dtypes)[ts_col] != "double"
              else -F.col("__ts"))
    key = F.struct(F.col("__as").alias("a"), neg_ts.alias("t"),
                   F.col("__ts").alias("ts"))
    agg = scored.groupBy(entity_col).agg(
        F.max(key).alias("__k"),
        F.max("__n").alias("__n"), F.max("__var").alias("__var"))
    sigma = F.sqrt(F.col("__var"))
    score = F.when(F.col("__var") > 0,
                   F.col("__k.a") / (sigma * F.sqrt(F.col("__n"))))
    return agg.select(
        F.col(entity_col), F.col("__n").cast("long").alias("n"),
        F.col("__k.ts").alias("cp_ts"), score.alias("score"))


def mase_eval(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    season: int = 1,
    tie_col: str | None = None,
) -> DataFrame:
    """Per-entity MASE (mean absolute scaled error — Hyndman & Koehler
    2006) of the seasonal-naive forecast ``ŷ_t = y_{t−season}``:

        mase = mean|y_t − y_{t−season}| / mean|y_t − y_{t−1}|

    the scale-free forecastability diagnostic: < 1 means the seasonal
    pattern beats a random-walk carry-forward, ≫ 1 means the series has
    no usable seasonal structure (don't build lag-``season`` features
    for it). Output ``(entity, n_scored, mase)``; NULL when the naive
    denominator is 0 (constant series) or too few points.

    Scale shape: both lags come from ONE window pass on the engine-wide
    per-entity ordering (same exchange+sort as lag/ffill/sessionize),
    then one per-entity aggregate of two conditional sums — no joins,
    no second scan."""
    if season < 1:
        raise ValueError("season must be >= 1")
    order = [F.col(ts_col)] + ([F.col(tie_col)] if tie_col else [])
    w = Window.partitionBy(entity_col).orderBy(*order)
    y = F.col(value_col).cast("double")
    es = F.abs(y - F.lag(y, season).over(w))
    e1 = F.abs(y - F.lag(y, 1).over(w))
    per = df.select(F.col(entity_col), es.alias("__es"),
                    e1.alias("__e1"))
    agg = per.groupBy(entity_col).agg(
        F.count("__es").alias("n_scored"),
        F.sum("__es").alias("__ses"),
        F.count("__e1").alias("__n1"),
        F.sum("__e1").alias("__se1"))
    num = F.col("__ses") / F.col("n_scored")
    den = F.col("__se1") / F.col("__n1")
    mase = F.when((F.col("n_scored") > 0) & (den > 0), num / den)
    return agg.select(
        F.col(entity_col), F.col("n_scored").cast("long").alias("n_scored"),
        mase.alias("mase"))


def seasonality_strength(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    bucket: str = "hour",
) -> DataFrame:
    """Per-entity seasonality strength — the one-way-ANOVA variance
    share of a calendar bucket (hour of day by default):

        strength = SSB / SST
                 = (Σ_h s_h²/n_h − S²/N) / (Σx² − S²/N)

    i.e. how much of the value's variance the time-of-day profile
    explains, in [0, 1] up to rounding: ~0 ⇒ no diurnal structure
    (don't build hour features), → 1 ⇒ the series IS its calendar
    profile (typical for bot traffic — cron-driven crawlers score near
    1 while humans are diffuse, which makes this a behavioral bot
    signal next to session_paths). NULL when total variance is 0 or
    the entity has < 2 rows. ``bucket`` ∈ {hour, dayofweek}.

    Scale shape: ONE (entity, bucket) groupBy and ONE entity groupBy
    over the bucket aggregate — two map-side-combined shuffles on the
    engine-wide entity key, no windows, no joins back to corpus rows;
    every float is a ratio of sums through one fixed op tree."""
    buckets = {"hour": F.hour, "dayofweek": F.dayofweek}
    if bucket not in buckets:
        raise ValueError(f"bucket must be one of {sorted(buckets)}")
    b = buckets[bucket](F.col(ts_col).cast("timestamp"))
    x = F.col(value_col).cast("double")
    per_b = (df.select(F.col(entity_col), b.alias("__h"), x.alias("__x"))
             .groupBy(entity_col, "__h")
             .agg(F.count("__x").alias("__nh"),
                  F.sum("__x").alias("__sh"),
                  F.sum(F.col("__x") * F.col("__x")).alias("__qh")))
    agg = per_b.groupBy(entity_col).agg(
        F.sum("__nh").cast("long").alias("n"),
        F.sum("__sh").alias("__s"),
        F.sum("__qh").alias("__q"),
        F.sum(F.col("__sh") * F.col("__sh")
              / F.col("__nh").cast("double")).alias("__ssb_raw"),
        F.count("*").cast("long").alias("n_buckets"))
    nd = F.col("n").cast("double")
    corr = F.col("__s") * F.col("__s") / nd
    sst = F.col("__q") - corr
    ssb = F.col("__ssb_raw") - corr
    strength = F.when((F.col("n") >= 2) & (sst > 0), ssb / sst)
    return agg.select(
        F.col(entity_col), "n", "n_buckets",
        strength.alias("strength"))
