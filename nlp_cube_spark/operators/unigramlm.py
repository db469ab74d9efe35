"""Unigram-LM subword tokenizer (SentencePiece) training primitives.

Kudo 2018, "Subword Regularization: Improving Neural Network Translation
Models with Multiple Subword Candidates" (the SentencePiece unigram
trainer): seed a large candidate-piece vocabulary from substring
statistics, fit piece probabilities by EM over the best (Viterbi)
segmentations, prune. This module implements the deterministic hard-EM
core — seed vocab, exact Viterbi segmenter, and the count re-estimation
(M) step — as pure relational Spark. The reference repo trains no
subword vocabulary (cube/networks/tokenizer.py is a sentence/token
BOUNDARY model; subwords come pretrained with XLM-R,
utils_tokenizer.py:394-576) — this is LLM-data-pipeline scope, the
sibling of operators/bpe.py.

Exactness: piece log-probs are floor-quantized to integer nano-units
once per E-step, path scores are BIGINT sums, and the per-position
argmax tie-breaks on (score, piece_len) — which is UNIQUE at each
(word, pos) because equal piece length implies the same predecessor and
piece. The whole trajectory (seed ranks, segmentations, EM counts) is
therefore bit-identical at any parallelism and replayable in SQL.

100 TB shape: everything after the first (word) hash agg runs on the
DISTINCT-WORD dimension (the dedup-then-process discipline of the
lemmatizer): substring explode is <= max_word_len * max_piece_len rows
per distinct word, the Viterbi loop is max_word_len joins keyed on
(word, pos) over that dimension, and corpus-sized data is touched
exactly once (the word-frequency agg). Seed ranking is one window over
the candidate dimension (swap in the exclusive-prefix-sum device if the
candidate space ever outgrows one task's sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = [
    "word_freqs",
    "unigram_seed_vocab",
    "unigram_segment",
    "unigram_em_counts",
    "unigram_train",
]


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) — the ONE corpus-sized pass; everything downstream
    is dimension-sized."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), "\\s+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _spans(words: DataFrame, max_piece_len: int, max_word_len: int) -> DataFrame:
    """All (word, i, j, piece) substring spans, 0-based exclusive:
    piece = word[i:j], 1 <= j-i <= max_piece_len. Words longer than
    max_word_len are dropped (documented contract; raise the knob for
    agglutinative corpora)."""
    w = words.where(F.length("word") <= max_word_len)
    return (
        w.select(
            "word",
            "freq",
            F.explode(F.sequence(F.lit(0), F.length("word") - 1)).alias("i"),
        )
        .select(
            "word",
            "freq",
            "i",
            F.explode(
                F.sequence(
                    F.col("i") + 1,
                    F.least(F.col("i") + max_piece_len, F.length("word")),
                )
            ).alias("j"),
        )
        .select(
            "word",
            "freq",
            "i",
            "j",
            F.expr("substr(word, i + 1, j - i)").alias("piece"),
        )
    )


def unigram_seed_vocab(
    words: DataFrame,
    vocab_size: int = 48,
    max_piece_len: int = 4,
    max_word_len: int = 16,
) -> DataFrame:
    """Seed candidate vocabulary: the vocab_size most frequent substrings
    (freq-weighted occurrence counts, ties to the lexicographically
    smaller piece) UNION all single characters — single chars guarantee
    every word segments (Kudo's required-character rule). Returns
    (piece, cnt, lp_nano): lp renormalized over the selected vocab."""
    occ = (
        _spans(words, max_piece_len, max_word_len)
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("piece"))
    top = occ.withColumn("_rk", F.row_number().over(w)).where(
        (F.col("_rk") <= vocab_size) | (F.length("piece") == 1)
    ).drop("_rk")
    tot = top.agg(F.sum("cnt").alias("_T"))
    return top.crossJoin(F.broadcast(tot)).select(
        "piece",
        "cnt",
        F.floor(F.log(F.col("cnt") / F.col("_T")) * 1e9 + F.lit(0.5))
        .cast("bigint")
        .alias("lp_nano"),
    )


def unigram_segment(
    words: DataFrame,
    vocab: DataFrame,
    max_piece_len: int = 4,
    max_word_len: int = 16,
) -> DataFrame:
    """Viterbi-best segmentation of each distinct word under the piece
    LM: dp[j] = max over i of dp[i] + lp(word[i:j]), argmax tie-broken
    by longer piece (unique — see module docstring). Returns
    (word, freq, n_pieces, seg) with seg = space-joined pieces; words
    above max_word_len (or containing a character outside the vocab)
    are absent.

    The loop is max_word_len DataFrame steps over the (word) dimension;
    the span/vocab join happens ONCE up front and is localCheckpointed
    (it feeds every step — the shared-subtree rule)."""
    spans = (
        _spans(words, max_piece_len, max_word_len)
        .join(vocab.select("piece", "lp_nano"), "piece")
        .select("word", "i", "j", "piece", "lp_nano")
        .localCheckpoint(eager=False)
    )
    base = words.where(F.length("word") <= max_word_len).select("word", "freq")
    dp = base.select(
        "word",
        F.lit(0).alias("j"),
        F.lit(0).cast("bigint").alias("score"),
        F.expr("cast(array() as array<string>)").alias("path"),
    )
    frontier = dp
    for step in range(1, max_word_len + 1):
        cand = (
            spans.where(F.col("j") == step)
            .alias("s")
            .join(
                frontier.where(F.col("j") >= step - max_piece_len)
                .alias("d"),
                (F.col("s.word") == F.col("d.word"))
                & (F.col("s.i") == F.col("d.j")),
            )
            .select(
                F.col("s.word").alias("word"),
                (F.col("d.score") + F.col("s.lp_nano")).alias("_sc"),
                (F.col("s.j") - F.col("s.i")).alias("_len"),
                F.array_append(F.col("d.path"), F.col("s.piece")).alias("_path"),
            )
        )
        best = cand.groupBy("word").agg(
            F.max_by(
                F.struct(
                    F.col("_sc").alias("score"), F.col("_path").alias("path")
                ),
                F.struct(F.col("_sc"), F.col("_len")),
            ).alias("_b")
        )
        step_dp = best.select(
            "word",
            F.lit(step).alias("j"),
            F.col("_b.score").alias("score"),
            F.col("_b.path").alias("path"),
        )
        frontier = frontier.unionByName(step_dp)
        if step % 4 == 0:
            frontier = frontier.localCheckpoint(eager=False)
    done = frontier.join(
        base.select("word", "freq", F.length("word").alias("_L")),
        "word",
    ).where(F.col("j") == F.col("_L"))
    return done.select(
        "word",
        "freq",
        F.size("path").alias("n_pieces"),
        F.array_join("path", " ").alias("seg"),
    )


def unigram_em_counts(
    words: DataFrame,
    vocab: DataFrame,
    max_piece_len: int = 4,
    max_word_len: int = 16,
) -> DataFrame:
    """One hard-EM (Viterbi-EM) M-step: re-estimated piece counts from
    the best segmentations, freq-weighted — iterating
    seed -> segment -> counts -> new lp is the SentencePiece training
    loop (Kudo 2018 §3.2; hard assignment instead of the full
    forward-backward expectation, the standard deterministic variant).
    Pieces the Viterbi paths never use come back with em_count 0 (the
    prune candidates)."""
    segs = unigram_segment(words, vocab, max_piece_len, max_word_len)
    used = (
        segs.select("freq", F.explode(F.split("seg", " ")).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("em_count"))
    )
    return vocab.select("piece", "cnt").join(used, "piece", "left").select(
        "piece",
        F.col("cnt").alias("seed_count"),
        F.coalesce("em_count", F.lit(0)).alias("em_count"),
    )


def unigram_train(
    docs: DataFrame,
    n_rounds: int = 2,
    vocab_size: int = 48,
    max_piece_len: int = 4,
    max_word_len: int = 16,
    k: float = 0.5,
) -> DataFrame:
    """Full hard-EM training loop (Kudo 2018 §3.2, Viterbi-EM variant):
    seed -> [segment -> re-estimate -> prune -> renormalize] x n_rounds.
    Pieces whose Viterbi usage drops to zero are pruned (except single
    characters — the coverage floor); surviving counts are add-k
    smoothed into the next round's log-probs. Returns the final
    (piece, cnt, lp_nano) vocab, drop-in for unigram_segment.

    Alternating maximization: re-segmentation under fixed probs and
    re-estimation under fixed segmentations each (weakly) increase the
    corpus Viterbi log-likelihood — asserted in-suite up to nano-unit
    quantization slack. Each round costs one dimension-sized segment
    pass; the corpus is still touched only once (word_freqs), so
    n_rounds scales with the distinct-word dimension, not the corpus.
    """
    words = word_freqs(docs).localCheckpoint(eager=False)
    vocab = unigram_seed_vocab(words, vocab_size, max_piece_len, max_word_len)
    for _ in range(n_rounds):
        counts = unigram_em_counts(words, vocab, max_piece_len, max_word_len)
        keep = counts.where(
            (F.col("em_count") > 0) | (F.length("piece") == 1)
        ).select("piece", F.col("em_count").alias("cnt"))
        tot = keep.agg(
            F.sum("cnt").alias("_T"), F.count(F.lit(1)).alias("_V")
        )
        vocab = (
            keep.crossJoin(F.broadcast(tot))
            .select(
                "piece",
                "cnt",
                F.floor(
                    F.log(
                        (F.col("cnt") + k) / (F.col("_T") + k * F.col("_V"))
                    )
                    * 1e9
                    + F.lit(0.5)
                )
                .cast("bigint")
                .alias("lp_nano"),
            )
            .localCheckpoint(eager=False)
        )
    return vocab
