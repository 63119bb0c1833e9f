"""Tabular feature encoders and drift monitors — target encoding and
population-stability-index (PSI), the feature-engineering steps between
raw curation signals and a trained quality model.

Reference scope note: pyradiomics emits features, it never encodes
categoricals or monitors drift; this is LLM-pipeline surface like
functions/textstats.py (the quality-classifier training loop in
operators/training.py consumes these).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def target_encode(
    df: DataFrame,
    cat_col: str,
    y_col: str,
    smoothing: float = 10.0,
    out_col: str | None = None,
    leave_one_out: bool = False,
) -> DataFrame:
    """Mean target encoding for a categorical column with additive
    smoothing toward the global mean (Micci-Barreca 2001):

        enc(c) = (sum_y(c) + m·global_mean) / (n(c) + m)

    — rare categories shrink to the prior instead of memorizing noise.
    ``leave_one_out=True`` excludes the row's OWN target from its
    category statistics ((sum_y − y)/(n − 1) before smoothing) — the
    leakage-safe form for encoding the training split itself;
    singleton categories fall back to the smoothed prior.

    Scale shape: one map-side-combined category aggregate (|categories|
    rows), a broadcast 1-row global mean, and an equi-join back — a hot
    category skews only the AQE-splittable probe side. LOO needs no
    second pass: the row's own contribution subtracts as an expression.
    """
    if smoothing < 0:
        raise ValueError("smoothing must be >= 0")
    out_col = out_col or f"{cat_col}_enc"
    y = F.col(y_col).cast("double")
    stats = df.groupBy(cat_col).agg(
        F.sum(y).alias("__sy"), F.count(y).alias("__n"))
    gmean = F.broadcast(df.agg(
        (F.sum(y) / F.count(y)).alias("__gm")))
    j = df.join(stats, cat_col, "left").crossJoin(gmean)
    m = F.lit(float(smoothing))
    if leave_one_out:
        sy = F.col("__sy") - y
        n = F.col("__n") - 1
    else:
        sy = F.col("__sy")
        n = F.col("__n")
    enc = F.when(n + m > 0,
                 (sy + m * F.col("__gm")) / (n + m)).otherwise(
        F.col("__gm"))
    return j.withColumn(out_col, enc).drop("__sy", "__n", "__gm")


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    probs: tuple = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
    round_dp: int | None = 6,
) -> DataFrame:
    """Population Stability Index between a baseline corpus ``df_a`` and
    a new snapshot ``df_b`` over one numeric column — the standard
    is-my-feature-distribution-drifting monitor (PSI < 0.1 stable,
    > 0.25 act):

        PSI = Σ_bins (q_i − p_i) · ln(q_i / p_i)

    Bin edges are the BASELINE quantiles at ``probs`` (so the baseline
    lands ~uniform); empty bins are floored at one pseudo-count to keep
    the log finite (the standard continuity fix, applied identically to
    both sides). Output: one row per bin (bin, p_a, p_b, term) plus a
    ``('__psi__', NULL, NULL, total)`` row.

    Scale shape: ONE exact-percentile aggregate on the baseline
    broadcast back as literals-in-plan (crossJoin of a 1-row frame),
    scan-fused bin assignment on both corpora, one census groupBy per
    side, and a |bins|-row join — never a corpus-row shuffle.
    ``round_dp`` floor-rounds the edges (the repo's ``_rnd`` convention)
    so bin assignment is reproducible across engines."""
    edges_row = df_a.agg(*[
        F.percentile(F.col(col), F.lit(float(p))).alias(f"__e{i}")
        for i, p in enumerate(probs)])
    if round_dp is not None:
        shift = 0.5 + 2.0 ** -20
        scale = float(10 ** round_dp)
        edges_row = edges_row.select(*[
            (F.floor(F.col(f"__e{i}") * scale + shift) / scale)
            .alias(f"__e{i}") for i in range(len(probs))])
    edges_b = F.broadcast(edges_row)

    def binned(df):
        b = F.lit(0)
        for i in range(len(probs)):
            b = b + F.when(F.col(col) > F.col(f"__e{i}"), 1).otherwise(0)
        return (df.crossJoin(edges_b)
                .select(b.alias("bin"))
                .groupBy("bin").agg(F.count("*").alias("c")))
    ca = binned(df_a).withColumnRenamed("c", "ca")
    cb = binned(df_b).withColumnRenamed("c", "cb")
    j = (ca.join(cb, "bin", "full_outer").fillna(0, ["ca", "cb"])
         .select("bin",
                 F.greatest(F.col("ca"), F.lit(1)).alias("ca"),
                 F.greatest(F.col("cb"), F.lit(1)).alias("cb")))
    tot = F.broadcast(j.agg(F.sum("ca").alias("ta"),
                            F.sum("cb").alias("tb")))
    scored = j.crossJoin(tot).select(
        "bin",
        (F.col("ca") / F.col("ta")).alias("p_a"),
        (F.col("cb") / F.col("tb")).alias("p_b"),
        ((F.col("cb") / F.col("tb") - F.col("ca") / F.col("ta"))
         * F.log((F.col("cb") / F.col("tb"))
                 / (F.col("ca") / F.col("ta")))).alias("term"))
    total = scored.agg(F.sum("term").alias("term")).select(
        F.lit(-1).alias("bin"),
        F.lit(None).cast("double").alias("p_a"),
        F.lit(None).cast("double").alias("p_b"), "term")
    return scored.unionByName(total)


def feature_hash(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_features: int = 1024,
    seed: int = 0,
) -> DataFrame:
    """The hashing trick (Weinberger et al., ICML'09; Vowpal Wabbit's
    featurizer): whitespace tokens of ``text_col`` map to
    ``(id, feat_idx, feat_val)`` sparse rows with
    ``feat_idx = md5(tok:seed) % n_features`` and a ±1 sign drawn from
    the next md5 hex digit, summed per (id, idx). Signed hashing keeps
    the implicit inner products unbiased under collisions — the
    property that lets a fixed-width model train over an unbounded,
    drifting vocabulary with NO fitted dictionary (nothing to broadcast,
    nothing to version per crawl; the encoder is a pure expression).

    Deterministic md5 family → the same corpus hashes identically on
    any engine or cluster; an oracle replays every row bit-for-bit.

    Scale shape: one explode + ONE map-side-combined groupBy on
    (id, idx) — each scan partition ships at most |its docs|·width
    partial cells; no fitted state, no second pass, no Python."""
    if n_features < 2:
        raise ValueError("n_features must be >= 2")
    toks = (df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " ")).alias("__tok"))
        .where(F.col("__tok") != ""))
    h = F.md5(F.concat(F.col("__tok"), F.lit(f":{seed}")))
    idx = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
           % F.lit(int(n_features)))
    # sign from hex digit 9's low bit — independent of the idx bits
    sign = F.when(
        (F.instr(F.lit("0123456789abcdef"), F.substring(h, 9, 1)) - 1)
        .bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(F.lit(-1))
    return (toks.select(F.col(id_col), idx.alias("feat_idx"),
                        sign.alias("__s"))
            .groupBy(id_col, "feat_idx")
            .agg(F.sum("__s").cast("long").alias("feat_val")))


def woe_encode(
    df: DataFrame,
    cat_col: str,
    y_col,
    alpha: float = 0.5,
) -> DataFrame:
    """Weight-of-evidence table for a categorical column against a
    binary target: ``(cat, n, n_pos, woe, iv)`` with Laplace-``alpha``
    smoothing on every per-category count (totals adjusted by
    ``alpha·|categories|`` so the smoothed class distributions still
    sum to 1):

        woe(c) = ln( p(c|y=1) / p(c|y=0) )
        iv     = Σ_c (p(c|y=1) − p(c|y=0)) · woe(c)

    (Siddiqi, *Credit Risk Scorecards* 2006.) WoE is the standard
    monotone categorical encoding for the quality/spam classifiers in
    curation loops, and IV — repeated on every row, aggregate-sized —
    is the screening statistic for whether the column is worth
    encoding at all (rule of thumb: IV < 0.02 useless, > 0.5 suspect).

    Scale shape: ONE map-side-combined category aggregate
    (|categories| rows), one broadcast totals row, one |categories|²-free
    window for IV over the aggregate — corpus rows are scanned once;
    encode rows by broadcast-joining this table back on ``cat_col``."""
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (unsmoothed WoE is "
                         "undefined for single-class categories)")
    from pyspark.sql import Window

    y = (F.col(y_col) if isinstance(y_col, str) else y_col).cast("double")
    stats = df.groupBy(cat_col).agg(
        F.count("*").alias("n"),
        F.sum(y).alias("__np"))
    a = F.lit(float(alpha))
    w = Window.partitionBy()
    c_cnt = F.count("*").over(w)
    tot_p = F.sum("__np").over(w)
    tot_n = F.sum(F.col("n") - F.col("__np")).over(w)
    p1 = (F.col("__np") + a) / (tot_p + a * c_cnt)
    p0 = (F.col("n") - F.col("__np") + a) / (tot_n + a * c_cnt)
    woe = F.log(p1 / p0)
    out = stats.select(
        F.col(cat_col), F.col("n"),
        F.col("__np").cast("long").alias("n_pos"),
        woe.alias("woe"),
        ((p1 - p0) * woe).alias("__ivc"))
    return out.withColumn("iv", F.sum("__ivc").over(w)).drop("__ivc")


def distribution_distance(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    round_to: int | None = None,
) -> DataFrame:
    """Two-sample distribution distances between ``a`` and ``b``'s
    ``value_col`` — one row ``(n_a, n_b, d_ks, w1)``:

        d_ks = max_v |F_a(v) − F_b(v)|        (Kolmogorov–Smirnov)
        w1   = Σ_gaps |F_a(v) − F_b(v)|·Δv    (1-D Wasserstein / EMD)

    over the empirical CDFs. The metric drift pair next to `psi_drift`
    (pre-binned, bin-sensitive) and `snapshot_drift` (vocabulary JSD):
    KS answers "did the distribution change anywhere", W1 "by how much
    in value units" — the pages-per-host / doc-length / latency drift
    gates between crawls.

    Scale shape: ONE census groupBy per side on the (optionally
    ``round_to``-quantized) value, a full-outer join of the two
    |support|-row censuses, and ONE ordered window over the joined
    support for the running CDFs. The window is support-sized, not
    corpus-sized — for continuous values pass ``round_to`` (or
    pre-quantize) so the support is bounded; exact integers/discrete
    values need no rounding."""
    v = F.col(value_col).cast("double")
    if round_to is not None:
        v = F.round(v, int(round_to))
    ca = a.select(v.alias("__v")).groupBy("__v").agg(
        F.count("*").alias("__na"))
    cb = b.select(v.alias("__v")).groupBy("__v").agg(
        F.count("*").alias("__nb"))
    j = ca.join(cb, "__v", "full_outer").select(
        "__v", F.coalesce(F.col("__na"), F.lit(0)).alias("__na"),
        F.coalesce(F.col("__nb"), F.lit(0)).alias("__nb"))
    from pyspark.sql import Window

    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    wn = Window.orderBy("__v")
    fa = (F.sum("__na").over(w).cast("double")
          / F.sum("__na").over(wt).cast("double"))
    fb = (F.sum("__nb").over(w).cast("double")
          / F.sum("__nb").over(wt).cast("double"))
    gap = F.lead("__v").over(wn) - F.col("__v")
    per = j.select(
        F.sum("__na").over(wt).alias("__ta"),
        F.sum("__nb").over(wt).alias("__tb"),
        F.abs(fa - fb).alias("__d"),
        (F.abs(fa - fb) * F.coalesce(gap, F.lit(0.0))).alias("__wd"))
    return per.agg(
        F.max("__ta").cast("long").alias("n_a"),
        F.max("__tb").cast("long").alias("n_b"),
        F.max("__d").alias("d_ks"),
        F.sum("__wd").alias("w1"))
