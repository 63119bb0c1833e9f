"""Explicit skew controls: deterministic salting for hot entity keys
(SURVEY.md §4 "What needs custom Spark machinery" item 2).

Host-keyed web corpora are power-law distributed (a few giant hosts), so a
plain ``groupBy(host)``/as-of shuffle puts whole hot hosts on one task. The
controls here:

* ``skew_stats``    — per-key row counts + skew factor (driver decision input)
* ``with_salt``     — deterministic salt column ``pmod(xxhash64(key, ts), S)``
* ``salted_asof_join`` — as-of join where the LEFT side is split S ways and
  the RIGHT timeline is replicated into every salt bucket (correct because
  every bucket needs the full right timeline; right side is the smaller
  snapshot table by assumption)

AQE skew-join splitting (enabled in session defaults) handles residual skew
in plain joins; salting is for the window/cogroup shuffles AQE can't split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def _keys(on) -> list:
    return [on] if isinstance(on, str) else list(on)


def skew_stats(df: DataFrame, on) -> DataFrame:
    """Per-key counts + global skew factor (max/avg) — one aggregation."""
    keys = _keys(on)
    counts = df.groupBy(*keys).agg(F.count("*").alias("n"))
    return counts.agg(
        F.count("*").alias("n_keys"),
        F.max("n").alias("max_rows"),
        F.avg("n").alias("avg_rows"),
        (F.max("n") / F.avg("n")).alias("skew_factor"),
    )


def hot_keys(df: DataFrame, on, top_k: int = 20) -> DataFrame:
    """The ``top_k`` heaviest keys with row count and corpus share —
    the per-key companion to ``skew_stats``: skew_stats says WHETHER the
    key space is skewed, hot_keys says WHICH keys to salt / cap / route
    to the broadcast side. Output (key cols..., n, share), ties on n
    broken by key so the cut is engine-stable.

    Scale shape: one map-side-combined census groupBy (|keys| rows out),
    a broadcast 1-row total, and a k-bounded TakeOrderedAndProject —
    never a global sort, never a driver collect of the key space."""
    keys = _keys(on)
    counts = df.groupBy(*keys).agg(F.count("*").alias("n"))
    total = F.broadcast(counts.agg(F.sum("n").alias("__t")))
    return (counts.crossJoin(total)
            .select(*keys, "n",
                    (F.col("n") / F.col("__t")).alias("share"))
            .orderBy(F.col("n").desc(), *keys)
            .limit(int(top_k)))


def with_salt(df: DataFrame, on, buckets: int, extra_col: str | None = None) -> DataFrame:
    """Deterministic salt in [0, buckets): hash of key cols + a spreading
    column (e.g. the timestamp) so one key's rows fan out over buckets."""
    keys = _keys(on)
    cols = [F.col(c) for c in keys]
    if extra_col is not None:
        cols.append(F.col(extra_col).cast("string"))
    return df.withColumn(SALT, F.pmod(F.xxhash64(*cols), F.lit(buckets)))


def salted_asof_join(
    left: DataFrame,
    right: DataFrame,
    on,
    left_ts: str,
    right_ts: str,
    buckets: int = 8,
    allow_exact_matches: bool = True,
) -> DataFrame:
    """As-of join with the left side salted S ways per key.

    Left rows get ``salt = pmod(xxhash64(key, left_ts), S)``; the right
    timeline is replicated to all S buckets (explode over a salt literal
    array), so each (key, salt) partition contains the FULL right history —
    the merge is then embarrassingly parallel across buckets and a hot key's
    left rows split across S tasks.
    """
    from pyradiomics_spark.operators.asof import _dedupe_right_ties, asof_join

    keys = _keys(on)
    l_salted = with_salt(left, keys, buckets, extra_col=left_ts)
    # deterministic tie discipline applied ONCE, BEFORE replication — doing
    # it inside asof_join would re-aggregate the ×buckets-replicated right
    # table, paying the hot-key shuffle salting exists to avoid
    right_payload = [c for c in right.columns if c not in keys and c != right_ts]
    r_deduped = _dedupe_right_ties(right, keys, right_ts, right_payload)
    r_replicated = r_deduped.withColumn(
        SALT, F.explode(F.array([F.lit(i) for i in range(buckets)]))
    )
    out = asof_join(
        l_salted,
        r_replicated,
        on=keys + [SALT],
        left_ts=left_ts,
        right_ts=right_ts,
        allow_exact_matches=allow_exact_matches,
        deterministic_ties=False,  # already resolved pre-replication
    )
    return out.drop(SALT)
