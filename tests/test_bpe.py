"""BPE tokenizer training (ops/bpe.py).

The trainer has no SQL oracle (iterative algorithm), so correctness
rests on differential tests against a NAIVE reference implemented here
with deliberately different algorithms: pair counts recomputed from
scratch every step (vs the module's incremental inverted-index
maintenance) and merge application written recursively (vs the
module's imperative scan loop) — same greedy left-to-right semantics,
different shape, so a bug in either is unlikely to hide in both.
"""

from collections import Counter

import pyspark.sql.functions as F
import pytest


def naive_apply(syms, a, b):
    syms = list(syms)
    if len(syms) < 2:
        return syms
    if syms[0] == a and syms[1] == b:
        return [a + b] + naive_apply(syms[2:], a, b)
    return [syms[0]] + naive_apply(syms[1:], a, b)


def naive_train(hist, num_merges):
    words = [(list(w), f) for w, f in hist]
    merges = []
    for _ in range(num_merges):
        counts = Counter()
        for syms, f in words:
            for p in zip(syms, syms[1:]):
                counts[p] += f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        words = [(naive_apply(syms, *best), f) for syms, f in words]
    return merges, words


HIST = [("hug", 10), ("pug", 5), ("pun", 12), ("bun", 4), ("hugs", 5)]


def test_trainer_matches_naive_on_hand_corpus():
    from filefilter_spark.ops.bpe import train_bpe_histogram

    expected, _ = naive_train(HIST, 10)
    assert train_bpe_histogram(HIST, 10) == expected
    # and the first merge is the classic 'u'+'g' (count 20)
    assert expected[0] == ("u", "g")


def test_trainer_matches_naive_on_random_corpora():
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from filefilter_spark.ops.bpe import train_bpe_histogram

    word = st.text(alphabet="abc", min_size=1, max_size=6)
    hist_strategy = st.dictionaries(word, st.integers(1, 9), min_size=1, max_size=10)

    @settings(max_examples=200, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(hist_strategy, st.integers(0, 12))
    def run(hist_map, k):
        hist = sorted(hist_map.items())
        assert train_bpe_histogram(hist, k) == naive_train(hist, k)[0]

    run()


def test_distributed_mode_matches_driver_mode(spark):
    from filefilter_spark.ops.bpe import train_bpe

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["hug hug pug", "pun pun pun bun", "hugs hug pun", "pug bun hugs"]
        )],
        "doc_id int, text string",
    )
    driver = train_bpe(docs, num_merges=6)
    dist = train_bpe(docs, num_merges=6, distributed=True)
    assert dist == driver and len(driver) == 6


def test_trainer_stops_when_pairs_exhausted():
    from filefilter_spark.ops.bpe import train_bpe_histogram

    # 'ab' collapses to one symbol after 1 merge; 'c' never has a pair
    merges = train_bpe_histogram([("ab", 3), ("c", 9)], 100)
    assert merges == [("a", "b")]


def test_encode_reproduces_training_segmentation(spark):
    from filefilter_spark.ops.bpe import bpe_encode, train_bpe_histogram

    merges = train_bpe_histogram(HIST, 8)
    _, final_words = naive_train(HIST, 8)
    final = {"".join(s): s for s, _ in final_words}

    docs = spark.createDataFrame(
        [(0, "hug pun"), (1, "HUGS bun  pug"), (2, None)],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(docs, merges).collect()
    }
    assert got[0] == final["hug"] + final["pun"]
    # lowercased + whitespace-tokenized like word_histogram
    assert got[1] == final["hugs"] + final["bun"] + final["pug"]
    assert got[2] is None
    # unseen word still round-trips
    unseen = spark.createDataFrame([(0, "gups")], "doc_id int, text string")
    toks = bpe_encode(unseen, merges).collect()[0]["bpe_tokens"]
    assert "".join(toks) == "gups"


def test_word_histogram_min_freq_and_collect_cap(spark):
    from filefilter_spark.ops.bpe import train_bpe, word_histogram

    docs = spark.createDataFrame(
        [(0, "a a a b"), (1, "a b c")], "doc_id int, text string"
    )
    hist = {r["word"]: r["freq"] for r in word_histogram(docs).collect()}
    assert hist == {"a": 4, "b": 2, "c": 1}
    assert {r["word"] for r in word_histogram(docs, min_freq=2).collect()} == {"a", "b"}
    # forced driver mode raises on overflow...
    with pytest.raises(ValueError, match="max_vocab_collect"):
        train_bpe(docs, num_merges=2, max_vocab_collect=1, distributed=False)


def test_auto_mode_picks_winner_on_both_sides(spark, monkeypatch):
    # SCALING.md "BPE merge-loop mode crossover": the driver loop wins
    # at every collectable vocab size; past the cap it isn't runnable.
    # Auto must therefore (a) run the driver loop whenever the
    # histogram fits, (b) fall back to the distributed loop on
    # overflow — producing the identical merge table either way.
    import filefilter_spark.ops.bpe as bpe_mod

    docs = spark.createDataFrame(
        [(0, "hug hug hug pug"), (1, "hug pug pun"), (2, "bun hug")],
        "doc_id int, text string",
    )
    expected = bpe_mod.train_bpe(docs, num_merges=4, distributed=False)

    calls = {"driver": 0, "dist": 0}
    real_driver, real_dist = bpe_mod.train_bpe_histogram, bpe_mod.train_bpe_distributed

    def spy_driver(hist, k):
        calls["driver"] += 1
        return real_driver(hist, k)

    def spy_dist(hist, k):
        calls["dist"] += 1
        return real_dist(hist, k)

    monkeypatch.setattr(bpe_mod, "train_bpe_histogram", spy_driver)
    monkeypatch.setattr(bpe_mod, "train_bpe_distributed", spy_dist)

    # fits under the cap -> driver loop
    assert bpe_mod.train_bpe(docs, num_merges=4) == expected
    assert calls == {"driver": 1, "dist": 0}
    # overflows the cap -> distributed loop, same merges, no raise
    assert bpe_mod.train_bpe(docs, num_merges=4, max_vocab_collect=2) == expected
    assert calls == {"driver": 1, "dist": 1}


def test_char_pair_counts_hand(spark):
    from filefilter_spark.ops.bpe import char_pair_counts

    hist = spark.createDataFrame(
        [("hug", 10), ("pug", 5), ("x", 7)], "word string, freq long"
    )
    got = {r["pair"]: r["cnt"] for r in char_pair_counts(hist).collect()}
    # single-char words contribute nothing; 'ug' is shared
    assert got == {"hu": 10, "ug": 15, "pu": 5}
