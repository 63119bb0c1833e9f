"""Ranked-list fusion and ranking-quality evaluation — the retrieval
side of a curation pipeline: merge heterogeneous rankings (BM25, ANN
cosine, PageRank priors) without score calibration, and score any
ranking against graded relevance.

Reference scope note: pyradiomics has no retrieval stage; this is
LLM-pipeline surface next to similarity.py's ANN operators (which
produce the rankings these functions consume and evaluate).

Scale shape: both operators work on RANKINGS, not corpora — per-query
candidate lists that are k-bounded upstream (top-k ANN output, bounded
rank windows). Every window here partitions by query over those bounded
lists; nothing ever sorts or shuffles corpus rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    runs: list[DataFrame],
    on,
    rank_col: str = "rank",
    k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09):
    ``rrf_score(d) = Σ_runs 1/(k + rank_run(d))`` over the union of the
    input rankings, plus ``n_lists`` (how many runs returned the item).
    RRF is the standard way to merge rankings whose SCORES are
    incomparable (BM25 vs cosine vs a graph prior) — it reads only the
    ranks, needs no calibration, and a k of ~60 keeps one run's tail
    from drowning another's head.

    Each input must carry the ``on`` identifier columns and an integer
    1-based ``rank_col``. Items missing from a run simply contribute
    nothing (the Cormack form). With two runs the score is one sum of
    two exactly-computed divisions — bit-identical across engines;
    with more runs it is stable to the usual 1-ulp addition-order
    caveat. One unionByName + ONE map-side-combined groupBy on the
    identifier — rankings, never corpora, hit the shuffle."""
    if len(runs) < 2:
        raise ValueError("rrf_fuse needs at least two rankings")
    if k < 1:
        raise ValueError("k must be >= 1")
    keys = [on] if isinstance(on, str) else list(on)
    parts = [r.select(*keys, F.col(rank_col).cast("long").alias("__r"))
             for r in runs]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (u.groupBy(*keys)
            .agg(F.sum(F.lit(1.0) / (F.lit(float(k)) + F.col("__r")))
                 .alias("rrf_score"),
                 F.count("*").alias("n_lists")))


def ndcg_at_k(
    df: DataFrame,
    query_col: str,
    score_col: str,
    rel_col: str,
    k: int = 10,
    tie_col: str | None = None,
) -> DataFrame:
    """(query, dcg, idcg, ndcg) — normalized discounted cumulative gain
    at ``k`` (Järvelin & Kekäläinen, TOIS 2002; exponential-gain form)
    of a scored candidate list against graded relevance:

        DCG@k  = Σ_{r=1..k} (2^rel(r) − 1) / log2(r + 1)
        IDCG@k = the same over relevance sorted descending
        NDCG   = DCG / IDCG   (NULL when IDCG = 0 — no relevant items)

    The evaluation row for any ranking the engine produces (ANN runs vs
    brute-force truth, fused rankings vs editorial grades). Ranking
    ties break on ``tie_col`` (default: ``rel_col`` ascending then the
    tie column — pass the item id for full determinism; without it,
    equal scores make NDCG partition-order-dependent, so the gate
    always passes one).

    Scale shape: TWO rank windows partitioned by query over the
    candidate lists (bounded upstream — top-k ANN output, never corpus
    rows) + ONE per-query aggregate. Gains use exact integer
    ``2^rel − 1`` via bit shift; discounts are log2 of small integers —
    one fixed op tree both engines."""
    if k < 1:
        raise ValueError("k must be >= 1")
    ties = [F.col(tie_col).asc()] if tie_col else []
    w_run = Window.partitionBy(query_col).orderBy(
        F.col(score_col).desc(), *ties)
    w_ideal = Window.partitionBy(query_col).orderBy(
        F.col(rel_col).desc(), *ties)
    rel = F.col(rel_col).cast("long")
    r1 = F.row_number().over(w_run)
    r2 = F.row_number().over(w_ideal)
    scored = df.select(
        F.col(query_col), rel.alias("__rel"),
        r1.alias("__rr"), r2.alias("__ri"))
    # exact integer 2^rel − 1 via bit shift (shiftleft needs a column
    # operand -> SQL expression form), never floating pow; a negative
    # grade would shift by a negative count (undefined) — fail loudly
    scored = scored.withColumn(
        "__g",
        F.expr("CASE WHEN __rel < 0 THEN "
               "raise_error('ndcg_at_k: relevance must be >= 0') "
               "ELSE CAST(shiftleft(CAST(1 AS BIGINT), "
               "CAST(__rel AS INT)) - 1 AS DOUBLE) END"))
    disc = lambda r: F.log2(r.cast("double") + F.lit(1.0))  # noqa: E731
    agg = scored.groupBy(query_col).agg(
        F.sum(F.when(F.col("__rr") <= k,
                     F.col("__g") / disc(F.col("__rr")))
              .otherwise(0.0)).alias("dcg"),
        F.sum(F.when(F.col("__ri") <= k,
                     F.col("__g") / disc(F.col("__ri")))
              .otherwise(0.0)).alias("idcg"))
    return agg.select(
        query_col, "dcg", "idcg",
        F.when(F.col("idcg") > 0, F.col("dcg") / F.col("idcg"))
        .alias("ndcg"))
