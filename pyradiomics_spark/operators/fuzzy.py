"""Edit-distance (typo-tolerant) self-join over a string column —
entity resolution / vocabulary cleanup for web corpora: collapsing
near-identical hostnames, spell-variant tokens, and template slugs
before they fragment dedup keys and frequency censuses.

Reference scope note: pyradiomics has no string-similarity stage (its
unit of work is one image); this module exists for the LLM-pipeline
surface, next to the n-gram Jaccard / SimHash candidate generators in
operators/dedup.py — same candidates→verify architecture, here with
Levenshtein distance as the verifier.

Algorithm — FastSS deletion neighborhoods (Bocek et al., 2007): for
max_dist=1, ed(s, t) ≤ 1 implies D₁(s) ∩ D₁(t) ≠ ∅ where D₁(x) is x
plus every single-character deletion of x. Candidate generation is
therefore an equi-join on deletion variants (L+1 variants per string,
all built with builtin `transform`/`substring` — zero Python), and
each candidate pair is verified with the builtin `levenshtein`. This
is exact (no false negatives) and never compares strings that share no
variant — unlike q-gram prefix filtering it needs no global gram
frequency census pass.

Scale shape: variant explode (≤ L+1 rows per string) → ONE equi-join on
the variant key → distinct pairs → JVM-side levenshtein verify. The
variant key is skew-prone exactly like an LSH band bucket (very short
strings collapse to few variants), so the same ``bucket_cap`` treatment
as dedup._drop_hot_buckets applies: over-cap variant buckets are
broadcast-anti-joined away BEFORE the self-join and surfaced in a
monitoring table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyradiomics_spark.operators.dedup import _drop_hot_buckets


def _deletion_variants(col):
    """Array of the string itself plus every single-char deletion —
    builtin expressions only (whole-stage codegen'd)."""
    s = F.col(col) if isinstance(col, str) else col
    # delete char i (1-based): prefix [1, i-1] ++ suffix [i+1, end]
    dels = F.transform(
        F.sequence(F.lit(1), F.length(s)),
        lambda i: F.concat(s.substr(F.lit(1), i - 1),
                           s.substr(i + 1, F.length(s))),
    )
    return F.concat(F.array(s), dels)


def edit_join(
    df: DataFrame,
    col: str,
    max_dist: int = 1,
    bucket_cap: int | None = None,
) -> DataFrame:
    """All unordered pairs (w1 < w2) of DISTINCT values of ``col`` with
    Levenshtein distance ≤ ``max_dist``, plus the distance:
    (w1, w2, dist). Only max_dist=1 is supported — the deletion
    neighborhood grows O(L^d), and d=1 is the typo/variant regime this
    join is for; larger radii belong to the n-gram Jaccard pipeline.

    ``bucket_cap``: exclude deletion-variant buckets with more members
    (they self-join quadratically; the standard hot-bucket treatment —
    see dedup._drop_hot_buckets). Capped pairs may be lost, so the
    default (None) keeps everything; set it at web scale."""
    if max_dist != 1:
        raise ValueError(
            f"edit_join supports max_dist=1 only (got {max_dist}); "
            "use ngram Jaccard candidates for larger radii")
    words = df.select(F.col(col).alias("w")).where(
        F.col("w").isNotNull() & (F.col("w") != "")).distinct()
    variants = words.select(
        "w", F.explode(_deletion_variants("w")).alias("v"))
    if bucket_cap is not None:
        variants, _ = _drop_hot_buckets(variants, ["v"], bucket_cap)
    a = variants.alias("a")
    b = variants.alias("b")
    cand = (a.join(b, F.col("a.v") == F.col("b.v"))
            .where(F.col("a.w") < F.col("b.w"))
            .select(F.col("a.w").alias("w1"), F.col("b.w").alias("w2"))
            .distinct())
    return (cand
            .withColumn("dist", F.levenshtein("w1", "w2"))
            .where(F.col("dist") <= max_dist))


def edit_hot_buckets(
    df: DataFrame, col: str, bucket_cap: int
) -> DataFrame:
    """Monitoring twin of ``edit_join(bucket_cap=...)``: the deletion-
    variant buckets that exceed the cap, with membership counts."""
    words = df.select(F.col(col).alias("w")).where(
        F.col("w").isNotNull() & (F.col("w") != "")).distinct()
    variants = words.select(
        "w", F.explode(_deletion_variants("w")).alias("v"))
    _, hot = _drop_hot_buckets(variants, ["v"], bucket_cap)
    return hot
