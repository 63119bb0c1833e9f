"""Event-sequence analytics — ordered funnels and cohort retention, the
two classic event-table queries a reference user's downstream analysts
run against the engine's sessionized output.

Reference scope note: pyradiomics has no event layer; these extend the
engine's temporal family (sessionize/asof/windows) with ordered-sequence
semantics.

Both operators are pure relational: per-stage conditional-min aggregates
(funnel) and arithmetic week bucketing (cohort) — no windows over hot
users, no Python, and every chained aggregate/join keys on the SAME
entity column so a cluster run reuses one hash partitioning end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _epoch(col):
    return col.cast("timestamp").cast("double")


def funnel(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    stages: tuple,
) -> DataFrame:
    """Ordered funnel: per user, the timestamp of the first ``stages[0]``
    event, the first ``stages[1]`` event STRICTLY AFTER it, and so on —
    the order-sensitive definition (a purchase before the first view
    does not count), which a naive per-type min gets wrong. Returns one
    row per user present in ``df``: (user, ts_stage_1..n nullable,
    max_stage int).

    Scale shape: one conditional-min aggregate per stage, each keyed on
    the user column — k chained aggregates over one reusable hash
    partitioning, no ordered window over a hot user's whole history, no
    collect_list. Stage k's filter needs stage k-1's time, carried by an
    equi-join of the |users|-row aggregate (never corpus rows)."""
    if len(stages) < 1:
        raise ValueError("need at least one stage")
    ev = df.select(
        F.col(user_col).alias("__u"),
        _epoch(F.col(ts_col)).alias("__t"),
        F.col(type_col).alias("__e"))
    # ONE corpus shuffle up front: every later aggregate and join keys
    # on __u, so an explicit repartition lets Catalyst satisfy all their
    # distribution requirements from this single exchange instead of
    # re-shuffling the event table once per stage
    ev = ev.repartition(F.col("__u"))
    users = ev.select("__u").distinct()
    acc = users
    prev: str | None = None
    for i, stage in enumerate(stages, start=1):
        cur = f"ts_stage_{i}"
        if prev is None:
            agg = (ev.where(F.col("__e") == stage)
                   .groupBy("__u").agg(F.min("__t").alias(cur)))
            acc = acc.join(agg, "__u", "left")
        else:
            gated = (ev.join(acc.select("__u", prev), "__u")
                     .where((F.col("__e") == stage)
                            & F.col(prev).isNotNull()
                            & (F.col("__t") > F.col(prev))))
            agg = gated.groupBy("__u").agg(F.min("__t").alias(cur))
            acc = acc.join(agg, "__u", "left")
        prev = cur
    max_stage = F.lit(0)
    for i in range(1, len(stages) + 1):
        max_stage = F.when(
            F.col(f"ts_stage_{i}").isNotNull(), i).otherwise(max_stage)
    return acc.select(
        F.col("__u").alias(user_col),
        *[f"ts_stage_{i}" for i in range(1, len(stages) + 1)],
        max_stage.alias("max_stage"))


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    bucket_days: int = 7,
) -> DataFrame:
    """Cohort retention matrix: users grouped by the fixed-width time
    bucket of their FIRST event (arithmetic epoch buckets, not calendar
    weeks — identical in every engine and timezone), counted distinct in
    every later bucket they act in. Output (cohort, bucket_offset,
    n_users) — the (0, n) diagonal is cohort size.

    Scale shape: one min-aggregate per user (the cohort assignment —
    |users| rows), an equi-join back on the user key, and ONE distinct
    aggregate on (cohort, offset, user) before the count — exact
    distinct via two map-side-combined aggregates, never
    countDistinct over a skewed cohort in one task."""
    if bucket_days < 1:
        raise ValueError("bucket_days must be >= 1")
    width = float(bucket_days * 86400)
    ev = df.select(
        F.col(user_col).alias("__u"),
        F.floor(_epoch(F.col(ts_col)) / F.lit(width)).alias("__b"))
    # one corpus shuffle on the user key serves both the cohort
    # aggregate and the join back (ReusedExchange, as in funnel)
    ev = ev.repartition(F.col("__u"))
    first = ev.groupBy("__u").agg(F.min("__b").alias("__cohort"))
    acts = (ev.join(first, "__u")
            .select("__u", "__cohort",
                    (F.col("__b") - F.col("__cohort")).alias("__off"))
            .distinct())
    return (acts.groupBy("__cohort", "__off")
            .agg(F.count("*").alias("n_users"))
            .select(F.col("__cohort").alias("cohort"),
                    F.col("__off").alias("bucket_offset"),
                    "n_users"))


def event_transitions(
    df: DataFrame,
    key: str,
    ts_col: str,
    type_col: str,
    tie_col: str | None = None,
) -> DataFrame:
    """First-order Markov transition table over each entity's ordered
    event stream: (prev_type, next_type, n, prob) where ``prob`` is the
    row-normalized transition probability P(next | prev). The classic
    clickstream / crawl-action model — next-page prediction features,
    anomalous-bot detection (improbable chains), and dead-end analysis.

    Scale shape: ONE lag window per entity (ordered by ts with an
    optional deterministic tie column) produces the adjacent pairs; the
    census is a map-side-combined groupBy on (prev, next); the row
    normalizer is a window over the |types|²-row AGGREGATE (never corpus
    rows). Entities partition the only corpus-sized shuffle."""
    from pyspark.sql.window import Window

    order = [F.col(ts_col)] + ([F.col(tie_col)] if tie_col else [])
    w = Window.partitionBy(key).orderBy(*order)
    pairs = (df
             .withColumn("__prev", F.lag(type_col).over(w))
             .where(F.col("__prev").isNotNull())
             .select(F.col("__prev").alias("prev_type"),
                     F.col(type_col).alias("next_type")))
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count("*").alias("n"))
    wn = Window.partitionBy("prev_type")
    return counts.withColumn(
        "prob", F.col("n") / F.sum("n").over(wn))


def ab_welch_ttest(
    df: DataFrame,
    group_col: str,
    arm_col,
    value_col: str,
) -> DataFrame:
    """Welch two-sample t-test per group between arms 0 and 1 of
    ``arm_col`` (a boolean/int column — e.g. a deterministic hash-split
    of the entity id): per group, (n_a, n_b, mean_a, mean_b, t_stat,
    dof) with the Welch–Satterthwaite degrees of freedom. The standard
    A/B readout over an events table — and, in a data-pipeline setting,
    the drift test between two corpus slices' metric distributions.

    Scale shape: ONE map-side-combined groupBy computing six conditional
    sums (n/Σx/Σx² per arm); mean/variance/t are post-aggregation scalar
    arithmetic on the |groups|-row result. Sample variance uses the
    explicit (Σx² − n·mean²)/(n−1) form with one fixed operation tree so
    an oracle replays it exactly; NULL when an arm has < 2 samples."""
    arm = (F.col(arm_col) if isinstance(arm_col, str) else arm_col)
    a = F.when(arm.cast("int") == 0, F.col(value_col))
    b = F.when(arm.cast("int") == 1, F.col(value_col))
    agg = df.groupBy(group_col).agg(
        F.count(a).alias("n_a"), F.count(b).alias("n_b"),
        F.sum(a).alias("__sa"), F.sum(b).alias("__sb"),
        F.sum(a * a).alias("__qa"), F.sum(b * b).alias("__qb"))
    mean_a = F.col("__sa") / F.col("n_a")
    mean_b = F.col("__sb") / F.col("n_b")
    var_a = (F.col("__qa") - F.col("n_a") * (mean_a * mean_a)) \
        / (F.col("n_a") - 1)
    var_b = (F.col("__qb") - F.col("n_b") * (mean_b * mean_b)) \
        / (F.col("n_b") - 1)
    sea = var_a / F.col("n_a")
    seb = var_b / F.col("n_b")
    se2 = sea + seb
    t = (mean_a - mean_b) / F.sqrt(se2)
    dof = (se2 * se2) / (
        (sea * sea) / (F.col("n_a") - 1) + (seb * seb) / (F.col("n_b") - 1))
    # se2 == 0 (both arms constant) hits divide-by-zero, where engines
    # disagree (Spark non-ANSI → NULL, DuckDB float → inf) — gate it out
    ok = (F.col("n_a") >= 2) & (F.col("n_b") >= 2) & (se2 > 0)
    return agg.select(
        group_col, "n_a", "n_b",
        mean_a.alias("mean_a"), mean_b.alias("mean_b"),
        F.when(ok, t).alias("t_stat"),
        F.when(ok, dof).alias("dof"))


def session_paths(
    df: DataFrame,
    key: str,
    ts_col: str,
    type_col: str,
    gap_seconds: float = 1800.0,
    top_k: int = 20,
    tie_col: str | None = None,
) -> DataFrame:
    """Top-``top_k`` most common session paths: each entity's event
    stream is gap-sessionized, every session rendered as its ordered
    ``type_col`` sequence joined with '>', and the corpus-wide path
    census cut to the k most frequent — (path, n) with deterministic
    (n desc, path) ties. The classic clickstream product question
    ("what do users actually do?") and a bot signature detector
    (machine traffic repeats improbably exact paths).

    Scale shape: sessionization and path assembly both run on the
    per-entity partitioning (window + one groupBy on (entity, session));
    the census is a map-side-combined groupBy on the path string, and
    the cut is a k-bounded TakeOrdered — no global sort. Path strings
    are bounded by session length, which the gap bounds in practice;
    pathological never-idle entities are a monitoring concern upstream
    (hot_keys), not a shuffle hazard here (one row per session)."""
    from pyspark.sql.window import Window

    order = [F.col(ts_col)] + ([F.col(tie_col)] if tie_col else [])
    w = Window.partitionBy(key).orderBy(*order)
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    prev = F.lag(ts_col).over(w)
    new_sess = F.when(
        prev.isNull()
        | ((F.col(ts_col).cast("timestamp").cast("double")
            - prev.cast("timestamp").cast("double")) > gap_seconds),
        1).otherwise(0)
    sess = df.withColumn("__sid", F.sum(new_sess).over(cum))
    order_struct = F.struct(
        *([F.col(ts_col)] + ([F.col(tie_col)] if tie_col else [])
          + [F.col(type_col).alias("__t")]))
    paths = (sess.groupBy(key, "__sid")
             .agg(F.array_join(
                 F.transform(
                     F.array_sort(F.collect_list(order_struct)),
                     lambda s: s["__t"]),
                 ">").alias("path")))
    return (paths.groupBy("path").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "path").limit(int(top_k)))


def conversion_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    conversion_type: str,
    tie_col: str | None = None,
) -> DataFrame:
    """First- and last-touch conversion attribution: for every
    ``conversion_type`` event, credit the FIRST and the LAST
    non-conversion event type seen earlier in the same user's stream,
    then census per channel — ``(channel, first_touch, last_touch)``
    conversion counts, the two bookend models of marketing/funnel
    attribution (linear and position-decay interpolate between them).
    Conversions with no prior touch report under channel NULL, so the
    two columns each sum to the total conversion count — an invariant
    the tests pin.

    Scale shape: ONE per-user ordered window pass computes both running
    bookends (``first_value``/``last_value`` IGNORE NULLS over rows
    UNBOUNDED PRECEDING..1 PRECEDING — running state, not a per-pair
    join), then ONE map-side-combined census groupBy per model on
    |channels| keys, combined by a full-outer join on the |channels|-row
    aggregates. The window partitioning is the same per-user key every
    temporal operator here uses — one exchange end to end."""
    order = [F.col(ts_col)] + ([F.col(tie_col)] if tie_col else [])
    from pyspark.sql import Window

    w = (Window.partitionBy(user_col).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, -1))
    touch = F.when(F.col(type_col) != conversion_type, F.col(type_col))
    marked = df.select(
        F.col(user_col), F.col(type_col),
        F.first(touch, ignorenulls=True).over(w).alias("__ft"),
        F.last(touch, ignorenulls=True).over(w).alias("__lt"))
    conv = marked.where(F.col(type_col) == conversion_type)
    first = conv.groupBy(F.col("__ft").alias("channel")).agg(
        F.count("*").alias("first_touch"))
    last = conv.groupBy(F.col("__lt").alias("channel")).agg(
        F.count("*").alias("last_touch"))
    # the no-prior-touch channel is NULL — join null-safely so both
    # models' NULL rows land on ONE output row instead of two
    last = last.withColumnRenamed("channel", "__ch")
    return (first.join(last, F.col("channel").eqNullSafe(F.col("__ch")),
                       "full_outer")
            .select(F.coalesce(F.col("channel"), F.col("__ch"))
                    .alias("channel"),
                    F.coalesce(F.col("first_touch"), F.lit(0))
                    .cast("long").alias("first_touch"),
                    F.coalesce(F.col("last_touch"), F.lit(0))
                    .cast("long").alias("last_touch")))


def rfm_segments(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    n_tiles: int = 5,
    as_of=None,
) -> DataFrame:
    """RFM segmentation — per user: recency (days since last event at
    ``as_of``, default the corpus max timestamp), frequency (event
    count), monetary (value sum), plus ``r_score``/``f_score``/
    ``m_score`` ntile ranks 1..``n_tiles`` (5 = best: most recent,
    most frequent, highest value) and the concatenated ``rfm`` cell —
    the classic behavioral segmentation (Hughes 1994), used on event
    streams to split power users / at-risk / churned for per-segment
    feature pipelines.

    Scale shape: ONE map-side-combined per-user aggregate; the ntile
    windows run over the |users| AGGREGATE rows (ties broken by
    user_id, so scores are engine-exact), never corpus rows; ``as_of``
    defaults to a broadcast 1-row max — no driver action."""
    from pyspark.sql import Window

    if n_tiles < 2:
        raise ValueError("n_tiles must be >= 2")
    ts = F.col(ts_col).cast("timestamp").cast("double")
    agg = df.groupBy(user_col).agg(
        F.max(ts).alias("__last"),
        F.count("*").alias("frequency"),
        F.sum(F.col(value_col).cast("double")).alias("monetary"))
    if as_of is None:
        ref = F.broadcast(agg.agg(F.max("__last").alias("__ref")))
        agg = agg.crossJoin(ref)
    else:
        agg = agg.withColumn(
            "__ref", F.lit(as_of).cast("timestamp").cast("double"))
    agg = agg.withColumn(
        "recency_days",
        (F.col("__ref") - F.col("__last")) / F.lit(86400.0))
    wr = Window.orderBy(F.col("recency_days").asc(), F.col(user_col))
    wf = Window.orderBy(F.col("frequency").desc(), F.col(user_col))
    wm = Window.orderBy(F.col("monetary").desc(), F.col(user_col))
    # most-recent / most-frequent / highest-value land in tile 1 →
    # invert so 5 is best, the conventional reading
    inv = lambda c: F.lit(n_tiles + 1) - c  # noqa: E731
    out = (agg
           .withColumn("r_score", inv(F.ntile(n_tiles).over(wr)))
           .withColumn("f_score", inv(F.ntile(n_tiles).over(wf)))
           .withColumn("m_score", inv(F.ntile(n_tiles).over(wm))))
    return out.select(
        F.col(user_col), "recency_days",
        F.col("frequency").cast("long").alias("frequency"), "monetary",
        F.col("r_score").cast("long").alias("r_score"),
        F.col("f_score").cast("long").alias("f_score"),
        F.col("m_score").cast("long").alias("m_score"),
        F.concat(F.col("r_score").cast("string"),
                 F.col("f_score").cast("string"),
                 F.col("m_score").cast("string")).alias("rfm"))


def group_percentiles(
    df: DataFrame,
    group_cols,
    value_col: str,
    percentiles=(0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact linear-interpolation percentiles per group — one output
    row per (group, p): ``(group..., p, value)`` — the latency/size
    distribution table every ops review reads (p50/p90/p99 by default).
    Uses the engine's exact ``percentile`` aggregate (the SQL-standard
    PERCENTILE_CONT definition DuckDB's quantile_cont shares, so the
    twin is engine-exact up to interpolation arithmetic).

    Scale note: exact percentiles sort each group's values INSIDE the
    aggregate — right for bounded-cardinality groups (event types,
    langs, hosts-per-shard); at unbounded group sizes use the GK-sketch
    arm (`sampling.quantile_buckets`) instead — this is the exact
    small-group form, ONE map-side-combined groupBy, no windows."""
    groups = [group_cols] if isinstance(group_cols, str) else list(
        group_cols)
    ps = list(percentiles)
    if not ps or not all(0.0 <= p <= 1.0 for p in ps):
        raise ValueError("percentiles must be in [0, 1]")
    arr = ", ".join(repr(float(p)) for p in ps)
    agg = df.groupBy(*groups).agg(
        F.expr(f"percentile({value_col}, array({arr}))").alias("__v"))
    pairs = F.arrays_zip(
        F.array(*[F.lit(float(p)) for p in ps]).alias("p"),
        F.col("__v").alias("value"))
    return (agg.select(*groups, F.explode(pairs).alias("__e"))
            .select(*groups, F.col("__e.p").alias("p"),
                    F.col("__e.value").alias("value")))


def markov_entropy(
    df: DataFrame,
    key: str,
    ts_col: str,
    type_col: str,
    tie_col: str | None = None,
) -> DataFrame:
    """One row ``(n_transitions, n_states, entropy_bits)`` — the
    empirical entropy rate of the first-order Markov chain over the
    corpus's event transitions:

        H = − Σ_{ij} (n_ij / N) · log2 P(j | i)

    (the transition-weighted conditional entropy; with the empirical
    prev-state distribution as weights it is the plug-in estimate of
    the chain's entropy rate). The sequence-predictability readout of
    `event_transitions`: scripted/bot traffic runs near 0 bits (a
    crawler's action loop is deterministic), organic sessions sit well
    above — the whole-corpus companion to `session_paths` and
    `seasonality`.

    Scale shape: event_transitions' one lag window + census, then ONE
    aggregate over the |types|²-row transition table — corpus rows are
    touched once."""
    from pyspark.sql import Window

    t = event_transitions(df, key, ts_col, type_col, tie_col=tie_col)
    tot = F.sum("n").over(Window.partitionBy())
    w = t.select(
        "n", "prob",
        (F.col("n") / tot).alias("__w"))
    return w.agg(
        F.sum("n").cast("long").alias("n_transitions"),
        F.count("*").cast("long").alias("n_states"),
        F.sum(-F.col("__w") * F.log2("prob")).alias("entropy_bits"))
