"""End-to-end curation pipeline (plans.curation): stage monotonicity,
transitive near-dup collapse, split determinism, gapless packing, and
committed outputs."""

import pytest

from pyspark.sql import functions as F

from pyradiomics_spark.plans.curation import curate


@pytest.fixture(scope="module")
def corpus(spark):
    base = [
        (i, f"unique document number {i} with some distinctive words "
            f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}")
        for i in range(60)
    ]
    # exact duplicates of doc 0
    dups = [(100 + k, base[0][1]) for k in range(3)]
    # near-dup chain: 200 ~ 201 ~ 202 (one-word edits)
    chain_text = ("the quick brown fox jumps over the lazy dog again and "
                  "again repeatedly every single day without fail ok")
    chain = [(200, chain_text),
             (201, chain_text.replace("quick", "swift")),
             (202, chain_text.replace("quick", "swift").replace("dog", "cat"))]
    # garbage: punctuation soup (fails quality), repeated phrase (fails rep)
    garbage = [(300, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),
               (301, " ".join(["spam ham jam"] * 40))]
    return spark.createDataFrame(base + dups + chain + garbage,
                                 "doc_id long, text string")


def test_curate_stage_counts_and_invariants(spark, corpus, tmp_path):
    m = curate(corpus, out_path=str(tmp_path / "cur"), seed=3,
               jaccard_threshold=0.6, bands=16)
    n_raw = corpus.count()
    assert m["n_raw"] == n_raw
    # 3 exact duplicates of doc 0 dropped
    assert m["n_after_exact_dedup"] == n_raw - 3
    # the 200-201-202 chain collapses to ONE survivor (transitive), so
    # near-dup removes at least 2 more docs
    assert m["n_after_neardup"] <= m["n_after_exact_dedup"] - 2
    # garbage docs die at the quality gate
    assert m["n_after_quality"] <= m["n_after_neardup"] - 1
    assert m["n_train_docs"] <= m["n_after_quality"]
    assert m["n_train_tokens"] > 0 and m["n_context_windows"] >= 1

    packed = spark.read.parquet(str(tmp_path / "cur/train_packed"))
    assert packed.count() == m["n_train_docs"]
    # committed layout is gapless and 0-based
    agg = packed.agg(
        F.min("start_off").alias("mn"),
        F.max(F.col("start_off") + F.col("__n_tok")).alias("end"),
        F.sum("__n_tok").alias("tok")).collect()[0]
    assert agg["mn"] == 0 and agg["end"] == agg["tok"] == m["n_train_tokens"]
    holdout = spark.read.parquet(str(tmp_path / "cur/holdout_ids"))
    assert set(r.split for r in holdout.select("split").distinct().collect()) \
        <= {"val", "test"}


def test_curate_deterministic(spark, corpus):
    a = curate(corpus, seed=3, jaccard_threshold=0.6, bands=16)
    b = curate(corpus, seed=3, jaccard_threshold=0.6, bands=16)
    assert a == b


def test_curate_metrics_single_pass(spark, corpus, monkeypatch):
    """Stage metrics must come from ONE aggregation over the flag lineage,
    not a count() per stage (at 100 TB each count() is a full corpus
    pass). The only count() actions allowed in curate() are the
    connected-components convergence confirmation and the decontamination
    check; driver collects stay bounded (two metric aggs + the CC
    signature per round + the packing offset tables)."""
    from pyspark.sql import DataFrame

    n_raw = corpus.count()
    calls = {"count": 0, "collect": 0}
    orig_count, orig_collect = DataFrame.count, DataFrame.collect

    def counted_count(self):
        calls["count"] += 1
        return orig_count(self)

    def counted_collect(self):
        calls["collect"] += 1
        return orig_collect(self)

    monkeypatch.setattr(DataFrame, "count", counted_count)
    monkeypatch.setattr(DataFrame, "collect", counted_collect)
    m = curate(corpus, seed=3, jaccard_threshold=0.6, bands=16)
    assert m["n_raw"] == n_raw
    assert calls["count"] <= 2, f"per-stage count() crept back: {calls}"
    assert calls["collect"] <= 12, f"unbounded driver collects: {calls}"


def test_curate_empty_corpus(spark, tmp_path):
    """Degenerate input (empty corpus) flows through every stage without
    crashing — the resume/backfill path can legitimately hand the pipeline
    zero new rows."""
    empty = spark.createDataFrame([], "doc_id long, text string")
    m = curate(empty, out_path=str(tmp_path / "empty_out"))
    assert m["n_raw"] == 0 and m["n_train_docs"] == 0
    assert m["n_train_tokens"] == 0 and m["cross_split_contamination"] == 0
