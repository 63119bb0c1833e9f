"""End-to-end training-data CURATION pipeline — the LLM-data story in one
callable, composing the verified operators in the order a production
pretraining pipeline runs them:

  scan → exact dedup (content hash)
       → near-dup clustering (MinHash-LSH candidates → exact-Jaccard
         verify → connected components → one survivor per cluster)
       → quality filter (relational scoring + repetition)
       → deterministic train/val/test split (hash, growth-stable)
       → sequence packing layout (concat-and-cut context windows)
       → committed parquet + metrics.

Every stage is individually gate-verified (dedup_exact, lsh_buckets,
dedup_components, text_quality, repetition, dataset_split,
pack_sequences); this plan pins their COMPOSITION: counts are monotone,
stages commute with partitioning, and the packed layout covers exactly
the surviving train split.

Scale shape: exact dedup = one sha2 shuffle; near-dup = banded equi-joins
+ O(log² n) component rounds; quality/split = pure projections; packing =
one bucketed window + an offset broadcast. Nothing collects to the driver
except the ≤ num_buckets offset tables and the metrics dict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyradiomics_spark.functions.textstats import (quality_features,
                                                   repetition_ratio)
from pyradiomics_spark.operators.components import dedup_by_components
from pyradiomics_spark.operators.dedup import (exact_dedup,
                                               minhash_lsh_candidates,
                                               minhash_signatures,
                                               ngram_jaccard_pairs)
from pyradiomics_spark.operators.sampling import (cross_split_contamination,
                                                  pack_sequences,
                                                  split_dataset)


def curate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.3,
    max_repetition: float = 0.35,
    jaccard_threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    pack_budget: int = 2048,
    seed: int = 0,
    out_path: str | None = None,
) -> dict:
    """Run the full curation pipeline; returns a metrics dict (stage
    counts + leak-style invariant checks). ``out_path`` commits the packed
    train split and the val/test doc lists as parquet."""
    n_raw = docs.count()

    # 1. exact dedup on content hash — one shuffle
    exact = exact_dedup(docs, id_col, text_col)
    n_exact = exact.count()

    # 2. near-dup clusters: candidates → verify → components → 1 survivor.
    # Transitive-safe: a–b–c chains collapse to ONE doc (pairwise
    # loser-dropping would keep a leaf), see operators.components.
    sigs = minhash_signatures(exact, id_col, text_col, num_hashes, shingle_n)
    cand = minhash_lsh_candidates(sigs, id_col, num_hashes, bands)
    verified = ngram_jaccard_pairs(
        exact, id_col, text_col, shingle_n, cand).where(
        F.col("jaccard") >= jaccard_threshold)
    deduped = dedup_by_components(exact, verified, id_col).cache()
    n_neardup = deduped.count()

    # 3. quality filter — pure projection
    scored = quality_features(deduped, text_col).withColumn(
        "rep_ratio", repetition_ratio(F.col(text_col)))
    kept = scored.where(
        (F.col("quality_score") >= min_quality)
        & (F.coalesce(F.col("rep_ratio"), F.lit(0.0)) <= max_repetition))
    n_kept = kept.count()

    # 4. deterministic split — stable under corpus growth
    split = split_dataset(kept, id_col, seed=seed)

    # 5. pack the train split into fixed context windows
    train = split.where(F.col("split") == "train")
    packed = pack_sequences(
        train.withColumn("__n_tok",
                         F.size(F.filter(F.split(F.col(text_col), " "),
                                         lambda x: x != ""))),
        id_col, "__n_tok", budget=pack_budget, seed=seed)
    n_train = packed.count()
    totals = packed.agg(
        F.sum("__n_tok").alias("tok"),
        F.max(F.col("start_off") + F.col("__n_tok")).alias("end"),
    ).collect()[0]
    n_tokens = int(totals["tok"] or 0)
    n_packs = -(-n_tokens // pack_budget) if n_tokens else 0

    # invariants (the composition contract)
    assert n_exact <= n_raw and n_neardup <= n_exact and n_kept <= n_neardup
    # packed layout is gapless: max(start+len) == Σ len
    assert int(totals["end"] or 0) == n_tokens
    # decontamination: exact dedup ran BEFORE the split, so no eval doc
    # can share byte-identical content with a train doc
    n_contam = cross_split_contamination(
        split, id_col, text_col).count()
    assert n_contam == 0, f"{n_contam} cross-split exact-content pairs"

    if out_path:
        packed.drop("bucket").write.mode("overwrite").parquet(
            f"{out_path}/train_packed")
        split.where(F.col("split") != "train").select(
            id_col, "split").write.mode("overwrite").parquet(
            f"{out_path}/holdout_ids")
    deduped.unpersist()

    return {
        "n_raw": n_raw,
        "n_after_exact_dedup": n_exact,
        "n_after_neardup": n_neardup,
        "n_after_quality": n_kept,
        "n_train_docs": n_train,
        "n_train_tokens": n_tokens,
        "n_context_windows": n_packs,
        "cross_split_contamination": n_contam,
    }
