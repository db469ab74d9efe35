"""Tokenizer training-target encoding (SURVEY §2a #9): reference-semantic
5-class alignment (utils_tokenizer.py:298-320), fused and treebank-gold
operator shapes."""

import pandas as pd

from nlp_cube_spark.datagen import pages_df
from nlp_cube_spark.kernels.targets import encode_targets, gold_tokens_from_words
from nlp_cube_spark.operators import annotate as A
from nlp_cube_spark.operators.targets import (
    fused_tokenizer_targets,
    tokenizer_targets_from_gold,
)


def test_encode_targets_reference_semantics():
    # 1:1 pretokens: every token ends a gold token; final one = sentence end
    assert encode_targets(["a", "b", "c"], [("a", 1), ("b", 1), ("c", 1)]) == [2, 2, 4]
    # multiword token -> 3; final gold token -> 4 even if multiword
    assert encode_targets(["del", "x"], [("del", 2), ("x", 1)]) == [3, 4]
    assert encode_targets(["x", "del"], [("x", 1), ("del", 2)]) == [2, 4]
    # pre-tokens finer than gold: inside positions are 1 (the class that
    # only exists in the treebank-gold shape)
    assert encode_targets(["wo", "rd"], [("word", 1)]) == [1, 4]
    assert encode_targets(["a", "bc", "d"], [("abc", 1), ("d", 1)]) == [1, 2, 4]
    # reference quirk: positions after sentence end stay 0 (the final loop
    # writes targets[ii], not targets[tt] — utils_tokenizer.py:315-318)
    assert encode_targets(["a", "b", "c"], [("a", 1)]) == [4, 0, 0]
    # space-stripped length comparison
    assert encode_targets(["x y"], [("xy", 1)]) == [4]
    assert encode_targets([], [("a", 1)]) == []


def test_gold_tokens_from_words():
    # consecutive words sharing a nonzero mwt_id collapse to one token
    assert gold_tokens_from_words(
        ["del", "del", "sol"], [2, 2, 0]
    ) == [("del", 2), ("sol", 1)]
    assert gold_tokens_from_words(["a", "b"], [0, 0]) == [("a", 1), ("b", 1)]
    # two DIFFERENT mwt groups back to back stay separate
    assert gold_tokens_from_words(
        ["del", "del", "al", "al"], [1, 1, 2, 2]
    ) == [("del", 2), ("al", 2)]


def test_fused_targets_on_pages(spark):
    pages = pages_df(spark, 20, seed=13).localCheckpoint()
    tgt = fused_tokenizer_targets(pages)
    rows = tgt.collect()
    assert rows
    by_sent = {}
    for r in rows:
        by_sent.setdefault((r.url, r.sent_id), []).append((r.pretok_id, r.target))
    saw_inside = False
    for sent, items in by_sent.items():
        items.sort()
        # contiguous 1-based pretok ids, exactly one sentence-end class
        assert [i for i, _ in items] == list(range(1, len(items) + 1))
        assert {t for _, t in items} <= {1, 2, 3, 4}
        assert sum(1 for _, t in items if t == 4) == 1
        assert items[-1][1] == 4
        saw_inside = saw_inside or any(t == 1 for _, t in items)
    # fixtures contain tokens the boundary decoder merges from several
    # pre-tokens (e.g. '1,000'), so inside-token class 1 must appear
    assert saw_inside


def test_gold_variant_matches_fused_on_self_consistent_gold(spark):
    """When gold == the engine's own tokenization, aligning the
    re-pretokenized reconstructed text must reproduce the fused targets."""
    pages = pages_df(spark, 15, seed=29).localCheckpoint()
    fused = {(r.url, r.sent_id, r.pretok_id): (r.pretok, r.target)
             for r in fused_tokenizer_targets(pages).collect()}
    words = A.annotate(pages)
    gold = {(r.url, r.sent_id, r.pretok_id): (r.pretok, r.target)
            for r in tokenizer_targets_from_gold(words).collect()}
    assert fused == gold


def test_gold_variant_emits_mwt_class(spark):
    """A gold MWT (es 'del' -> de+el) must produce class 3 at its token."""
    rows = [
        ("u1", "es", 0, 1, 1, "del", "de", "de", "ADP", "_", "_", 2, "case", True),
        ("u1", "es", 0, 2, 1, "del", "el", "el", "DET", "_", "_", 3, "det", True),
        ("u1", "es", 0, 3, 0, "sol", "sol", "sol", "NOUN", "_", "_", 0, "root", True),
    ]
    from nlp_cube_spark.io.conllu import WORDS_SCHEMA

    words = spark.createDataFrame(rows, WORDS_SCHEMA)
    got = sorted((r.pretok_id, r.pretok, r.target)
                 for r in tokenizer_targets_from_gold(words).collect())
    assert got == [(1, "del", 3), (2, "sol", 4)]
