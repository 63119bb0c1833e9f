"""BPE primitives vs a hand-rolled Sennrich reference."""

from collections import Counter

import pytest

from pyradiomics_spark.functions.bpe import (
    EOW, apply_merge, bpe_learn, pair_census, top_pairs, with_symbols,
    word_census)


def _ref_census(texts):
    words = Counter(w for t in texts for w in t.lower().split(" ") if w)
    return words


def _ref_pairs(vocab):
    pairs = Counter()
    for syms, n in vocab:
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] += n
    return pairs


def _ref_merge(syms, s1, s2):
    out = []
    for x in syms:
        if out and out[-1] == s1 and x == s2:
            out[-1] = s1 + s2
        else:
            out.append(x)
    return out


TEXTS = ["low lower lowest", "low low newer", "wider new newer"]


def test_census_and_pairs_match_reference(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    words = word_census(df)
    got_w = {r.word: r.n for r in words.collect()}
    assert got_w == dict(_ref_census(TEXTS))

    vocab = with_symbols(words)
    got_p = {(r.s1, r.s2): r.n for r in pair_census(vocab).collect()}
    ref = _ref_pairs([(list(w) + [EOW], n) for w, n in got_w.items()])
    assert got_p == dict(ref)

    top = top_pairs(pair_census(vocab), k=1).collect()[0]
    # deterministic argmax: highest n, then lexicographic (s1, s2)
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    assert (top.s1, top.s2, top.n) == (*want[0], want[1])


def test_apply_merge_greedy_left_to_right(spark):
    df = spark.createDataFrame(
        [("aaaa", 1, ["a", "a", "a", "a"]),
         ("aba", 1, ["a", "b", "a"])],
        ["word", "n", "syms"])
    out = {r.word: r.syms for r in apply_merge(df, "a", "a").collect()}
    assert out["aaaa"] == ["aa", "aa"]
    assert out["aba"] == ["a", "b", "a"]


def test_bpe_learn_matches_reference_merges(spark):
    df = spark.createDataFrame([(t,) for t in TEXTS], ["text"])
    merges, vocab = bpe_learn(df, n_merges=5)

    # full reference replay
    ref_vocab = {tuple(list(w) + [EOW]): n
                 for w, n in _ref_census(TEXTS).items()}
    ref_merges = []
    for _ in range(5):
        pairs = _ref_pairs(ref_vocab.items())
        if not pairs:
            break
        (s1, s2), n = sorted(pairs.items(),
                             key=lambda kv: (-kv[1], kv[0]))[0]
        ref_merges.append((s1, s2, n))
        ref_vocab = {tuple(_ref_merge(list(k), s1, s2)): v
                     for k, v in ref_vocab.items()}
    assert merges == ref_merges
    got_final = {r.word: tuple(r.syms) for r in vocab.collect()}
    want_final = {"".join(k).replace(EOW, ""): k for k in ref_vocab}
    assert got_final == want_final
