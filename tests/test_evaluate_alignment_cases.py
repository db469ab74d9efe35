"""The reference's own TestAlignment cases (conll18_ud_eval.py:534-580),
ported verbatim against our distributed evaluator: Words P/R/F1 must equal
the reference's expected fractions exactly, and mismatched character
streams must raise (the reference's UDError guard)."""

import pytest

from nlp_cube_spark.io.conllu import WORDS_SCHEMA
from nlp_cube_spark.operators import evaluate as EV


def _load_words(spark, words):
    """Mirror of the reference helper: 'tok' or 'tok w1 w2 ...' specs."""
    rows, num_words = [], 0
    for w in words:
        parts = w.split(" ")
        if len(parts) == 1:
            num_words += 1
            rows.append((num_words, 0, parts[0], parts[0]))
        else:
            mwt_id = num_words + 1
            for part in parts[1:]:
                num_words += 1
                rows.append((num_words, mwt_id, parts[0], part))
    out = [
        {
            "url": "u", "lang": "x", "sent_id": 0, "word_id": wid,
            "mwt_id": mid, "tok_form": tok, "form": form, "lemma": "_",
            "upos": "_", "xpos": "_", "feats": "_",
            "head": 0 if wid == 1 else 1, "deprel": "_", "space_after": True,
        }
        for wid, mid, tok, form in rows
    ]
    return spark.createDataFrame(out, WORDS_SCHEMA)


def _test_ok(spark, gold, system, correct):
    m = EV.evaluate(_load_words(spark, system), _load_words(spark, gold))
    gold_words = sum(max(1, len(w.split(" ")) - 1) for w in gold)
    system_words = sum(max(1, len(w.split(" ")) - 1) for w in system)
    assert m["Words"]["precision"] == pytest.approx(correct / system_words)
    assert m["Words"]["recall"] == pytest.approx(correct / gold_words)
    assert m["Words"]["f1"] == pytest.approx(2 * correct / (gold_words + system_words))


def test_exception(spark):
    with pytest.raises(ValueError, match="differ"):
        EV.evaluate(_load_words(spark, ["b"]), _load_words(spark, ["a"]))


def test_equal(spark):
    _test_ok(spark, ["a"], ["a"], 1)
    _test_ok(spark, ["a", "b", "c"], ["a", "b", "c"], 3)


def test_equal_with_multiword(spark):
    _test_ok(spark, ["abc a b c"], ["a", "b", "c"], 3)
    _test_ok(spark, ["a", "bc b c", "d"], ["a", "b", "c", "d"], 4)
    _test_ok(spark, ["abcd a b c d"], ["ab a b", "cd c d"], 4)
    _test_ok(spark, ["abc a b c", "de d e"], ["a", "bcd b c d", "e"], 5)


def test_alignment(spark):
    _test_ok(spark, ["abcd"], ["a", "b", "c", "d"], 0)
    _test_ok(spark, ["abc", "d"], ["a", "b", "c", "d"], 1)
    _test_ok(spark, ["a", "bc", "d"], ["a", "b", "c", "d"], 2)
    _test_ok(spark, ["a", "bc b c", "d"], ["a", "b", "cd"], 2)
    _test_ok(spark, ["abc a BX c", "def d EX f"], ["ab a b", "cd c d", "ef e f"], 4)
    _test_ok(spark, ["ab a b", "cd bc d"], ["a", "bc", "d"], 2)
    _test_ok(spark, ["a", "bc b c", "d"], ["ab AX BX", "cd CX a"], 1)
