"""Unigram-LM (SentencePiece) trainer primitives: seed, Viterbi, EM."""

import math

import pytest
from pyspark.sql import functions as F

from nlp_cube_spark.operators import unigramlm as U


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "abab ab abab"),
        (2, "ab cd abab"),
        (3, "cd cd b"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_freqs(spark, docs):
    got = {r.word: r.freq for r in U.word_freqs(docs).collect()}
    assert got == {"abab": 3, "ab": 2, "cd": 3, "b": 1}


def test_seed_vocab_includes_single_chars_and_renormalizes(spark, docs):
    words = U.word_freqs(docs)
    vocab = U.unigram_seed_vocab(words, vocab_size=4).collect()
    pieces = {r.piece: r for r in vocab}
    # all corpus chars present even if below the top-k cut
    for ch in "abcd":
        assert ch in pieces
    tot = sum(r.cnt for r in vocab)
    for r in vocab:
        assert r.lp_nano == math.floor(math.log(r.cnt / tot) * 1e9 + 0.5)


def test_viterbi_prefers_high_prob_long_piece(spark):
    words = spark.createDataFrame(
        [("abab", 3), ("ab", 2), ("b", 1)], "word string, freq long"
    )
    # lp(ab) much higher than lp(a)+lp(b) -> 'abab' = [ab, ab]
    vocab = spark.createDataFrame(
        [("a", 1, -3_000_000_000), ("b", 1, -3_000_000_000),
         ("ab", 10, -1_000_000_000)],
        "piece string, cnt long, lp_nano long",
    )
    got = {r.word: r for r in U.unigram_segment(words, vocab).collect()}
    assert got["abab"].seg == "ab ab" and got["abab"].n_pieces == 2
    assert got["ab"].seg == "ab"
    assert got["b"].seg == "b"


def test_viterbi_tiebreak_longer_piece(spark):
    # lp(ab) == lp(a) + lp(b): equal scores -> the longer piece wins
    words = spark.createDataFrame([("ab", 1)], "word string, freq long")
    vocab = spark.createDataFrame(
        [("a", 1, -1_000_000_000), ("b", 1, -1_000_000_000),
         ("ab", 1, -2_000_000_000)],
        "piece string, cnt long, lp_nano long",
    )
    got = U.unigram_segment(words, vocab).collect()
    assert got[0].seg == "ab"


def test_viterbi_matches_bruteforce(spark, docs):
    # exhaustive-search cross-check incl. the (score, len) tie-break
    words = U.word_freqs(docs)
    vocab = U.unigram_seed_vocab(words, vocab_size=6)
    lp = {r.piece: r.lp_nano for r in vocab.collect()}
    got = {r.word: r.seg for r in U.unigram_segment(words, vocab).collect()}

    def best(word):
        dp = {0: (0, ())}
        for j in range(1, len(word) + 1):
            cands = []
            for i in range(max(0, j - 4), j):
                p = word[i:j]
                if i in dp and p in lp:
                    cands.append((dp[i][0] + lp[p], j - i, dp[i][1] + (p,)))
            if cands:
                sc, ln, path = max(cands)
                dp[j] = (sc, path)
        return " ".join(dp[len(word)][1])

    for w in got:
        assert got[w] == best(w), w


def test_em_counts_reallocate_to_used_pieces(spark, docs):
    words = U.word_freqs(docs)
    vocab = U.unigram_seed_vocab(words, vocab_size=6)
    em = {r.piece: r for r in U.unigram_em_counts(words, vocab).collect()}
    # total EM mass == total pieces on Viterbi paths (freq-weighted)
    segs = U.unigram_segment(words, vocab).collect()
    want_total = sum(r.freq * r.n_pieces for r in segs)
    assert sum(r.em_count for r in em.values()) == want_total
    # every vocab piece is reported, unused ones at 0
    assert all(r.em_count >= 0 for r in em.values())
    used = {p for r in segs for p in r.seg.split(" ")}
    for p, r in em.items():
        if p not in used:
            assert r.em_count == 0


def test_segment_parallelism_invariant(spark, docs):
    words = U.word_freqs(docs)
    vocab = U.unigram_seed_vocab(words, vocab_size=6)
    outs = [
        sorted(
            U.unigram_segment(words.repartition(p), vocab).collect()
        )
        for p in (1, 3)
    ]
    assert outs[0] == outs[1]


def test_unigram_train_em_monotone_likelihood(spark):
    # corpus Viterbi log-likelihood (freq-weighted path score under the
    # CURRENT vocab) must not decrease across EM rounds — the
    # alternating-maximization guarantee, up to quantization slack.
    rows = [
        (1, "abab abab abcd"),
        (2, "ab cd abab abab"),
        (3, "cd cd dcba b"),
        (4, "abcd dcba ab"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    words = U.word_freqs(docs)

    def corpus_ll(vocab):
        segs = U.unigram_segment(words, vocab).collect()
        lp = {r.piece: r.lp_nano for r in vocab.collect()}
        return sum(r.freq * sum(lp[p] for p in r.seg.split(" ")) for r in segs)

    v0 = U.unigram_seed_vocab(words, vocab_size=8)
    lls = [corpus_ll(v0)]
    for rounds in (1, 2):
        v = U.unigram_train(docs, n_rounds=rounds, vocab_size=8)
        lls.append(corpus_ll(v))
    slack = 1000  # nano-units: ln-quantization + add-k smoothing jitter
    assert lls[1] >= lls[0] - slack
    assert lls[2] >= lls[1] - slack
    # pruning really happens: trained vocab has no zero-usage multi-char piece
    vf = U.unigram_train(docs, n_rounds=2, vocab_size=8)
    em = {r.piece: r for r in U.unigram_em_counts(words, vf).collect()}
    for p, r in em.items():
        if len(p) > 1:
            assert r.seed_count > 0
