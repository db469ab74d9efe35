"""CoNLL-2018-style distributed evaluator tests (reference
conll18_ud_eval.py semantics)."""

import pytest
from pyspark.sql import functions as F

from nlp_cube_spark import oracle
from nlp_cube_spark.datagen import gen_pages, pages_df
from nlp_cube_spark.io.conllu import WORDS_SCHEMA
from nlp_cube_spark.operators import annotate as A, evaluate as EV

N = 25
SEED = 2024


@pytest.fixture(scope="module")
def system(spark):
    return A.annotate(pages_df(spark, N, seed=SEED)).localCheckpoint()


@pytest.fixture(scope="module")
def gold(spark):
    rows, _ = oracle.run_oracle(gen_pages(N, seed=SEED))
    # oracle rows lack lang/tok_form: reconstruct tok_form for non-MWT as
    # form; MWT token surface comes from the fixture dictionary
    out = []
    for r in rows:
        out.append(
            {
                "url": r["url"], "lang": "x", "sent_id": r["sent_id"],
                "word_id": r["word_id"], "mwt_id": r["mwt_id"],
                "tok_form": r["form"] if r["mwt_id"] == 0 else {"a": "al", "el": "al"}.get(r["form"], r["form"]),
                "form": r["form"], "lemma": r["lemma"], "upos": r["upos"],
                "xpos": r["xpos"], "feats": r["feats"], "head": r["head"],
                "deprel": r["deprel"], "space_after": r["space_after"],
            }
        )
    return spark.createDataFrame(out, WORDS_SCHEMA).localCheckpoint()


def test_self_evaluation_is_perfect(spark, system):
    m = EV.evaluate(system, system)
    for k, v in m.items():
        assert v["f1"] == pytest.approx(1.0), (k, v)


def test_engine_vs_oracle_metrics(spark, system, gold):
    m = EV.evaluate(system, gold)
    assert m["Tokens"]["f1"] == pytest.approx(1.0)
    assert m["Sentences"]["f1"] == pytest.approx(1.0)
    assert m["Words"]["f1"] == pytest.approx(1.0)
    for k in ("UPOS", "Lemmas", "UAS", "LAS"):
        assert m[k]["f1"] >= 0.98, (k, m[k])


def test_perturbations_lower_the_right_metric(spark, system):
    # flip UPOS of every NOUN -> UPOS drops, Tokens stays perfect
    broken = system.withColumn(
        "upos", F.when(F.col("upos") == "NOUN", "X").otherwise(F.col("upos"))
    )
    m = EV.evaluate(broken, system)
    assert m["Tokens"]["f1"] == pytest.approx(1.0)
    assert m["UPOS"]["f1"] < 1.0
    assert m["UAS"]["f1"] == pytest.approx(1.0)

    # re-head every punct to itself-1 -> UAS/LAS drop, UPOS stays
    rehead = system.withColumn(
        "head", F.when(F.col("deprel") == "punct", F.greatest(F.col("word_id") - 1, F.lit(0))).otherwise(F.col("head"))
    )
    m2 = EV.evaluate(rehead, system)
    assert m2["UPOS"]["f1"] == pytest.approx(1.0)
    assert m2["UAS"]["f1"] < 1.0


def test_deprel_subtype_stripped(spark, system):
    sub = system.withColumn(
        "deprel", F.when(F.col("deprel") == "nsubj", F.lit("nsubj:pass")).otherwise(F.col("deprel"))
    )
    m = EV.evaluate(sub, system)
    # ':pass' subtype is stripped before comparison (conll18_ud_eval.py:160-161)
    assert m["LAS"]["f1"] == pytest.approx(1.0)


def test_clas_mlas_blex_present_and_perfect_on_self(spark, system):
    m = EV.evaluate(system, system)
    assert set(m) >= {"CLAS", "MLAS", "BLEX"}
    for k in ("CLAS", "MLAS", "BLEX"):
        assert m[k]["f1"] == pytest.approx(1.0), (k, m[k])


def test_functional_upos_flip_hits_mlas_not_clas(spark, system):
    """Mis-tag every det child: CLAS ignores functional words entirely,
    MLAS compares the functional-children lists and must drop
    (conll18_ud_eval.py:513-515)."""
    broken = system.withColumn(
        "upos", F.when(F.col("deprel") == "det", "X").otherwise(F.col("upos"))
    )
    m = EV.evaluate(broken, system)
    assert m["CLAS"]["f1"] == pytest.approx(1.0)
    assert m["BLEX"]["f1"] == pytest.approx(1.0)
    assert m["MLAS"]["f1"] < 1.0


def test_content_head_flip_hits_clas_and_blex(spark, system):
    broken = system.withColumn(
        "head", F.when(F.col("deprel") == "obj", F.lit(0)).otherwise(F.col("head"))
    )
    m = EV.evaluate(broken, system)
    assert m["CLAS"]["f1"] < 1.0
    assert m["BLEX"]["f1"] < 1.0
    assert m["UPOS"]["f1"] == pytest.approx(1.0)


def _words_df(spark, rows):
    """rows: (sent_id, word_id, mwt_id, tok_form, form, head, deprel)."""
    out = [
        {
            "url": "u1", "lang": "x", "sent_id": r[0], "word_id": r[1],
            "mwt_id": r[2], "tok_form": r[3], "form": r[4], "lemma": r[4],
            "upos": "NOUN", "xpos": "NN", "feats": "_", "head": r[5],
            "deprel": r[6], "space_after": True,
        }
        for r in rows
    ]
    from nlp_cube_spark.io.conllu import WORDS_SCHEMA

    return spark.createDataFrame(out, WORDS_SCHEMA)


def test_lcs_alignment_inside_differing_mwt_region(spark):
    """Gold expands MWT 'al' -> a+el; system emits plain token 'al'. The
    region has NO common form => zero aligned words inside it (the
    reference's LCS miss), while words outside still span-align."""
    gold = _words_df(spark, [
        (0, 1, 0, "Emma", "Emma", 2, "nsubj"),
        (0, 2, 1, "al", "a", 4, "case"),
        (0, 3, 1, "al", "el", 4, "det"),
        (0, 4, 0, "libro", "libro", 0, "root"),
    ])
    system = _words_df(spark, [
        (0, 1, 0, "Emma", "Emma", 2, "nsubj"),
        (0, 2, 0, "al", "al", 3, "case"),
        (0, 3, 0, "libro", "libro", 0, "root"),
    ])
    m = EV.evaluate(system, gold)
    # aligned = Emma + libro only
    assert m["Words"]["precision"] == pytest.approx(2 / 3)
    assert m["Words"]["recall"] == pytest.approx(2 / 4)
    # Tokens: spans Emma[0,4) al[4,6) libro[6,11) identical on both sides
    assert m["Tokens"]["f1"] == pytest.approx(1.0)


def test_lcs_alignment_partial_match_in_region(spark):
    """Gold MWT al -> a+el vs system MWT al -> a+lo: LCS aligns the shared
    'a' (reference :429-440) and head scoring goes through the alignment
    map, so Emma's head (the root 'libro') still scores."""
    gold = _words_df(spark, [
        (0, 1, 0, "Emma", "Emma", 4, "nsubj"),
        (0, 2, 1, "al", "a", 4, "case"),
        (0, 3, 1, "al", "el", 4, "det"),
        (0, 4, 0, "libro", "libro", 0, "root"),
    ])
    system = _words_df(spark, [
        (0, 1, 0, "Emma", "Emma", 4, "nsubj"),
        (0, 2, 1, "al", "a", 4, "case"),
        (0, 3, 1, "al", "lo", 4, "det"),
        (0, 4, 0, "libro", "libro", 0, "root"),
    ])
    m = EV.evaluate(system, gold)
    # aligned = Emma, a, libro (el/lo differ)
    assert m["Words"]["precision"] == pytest.approx(3 / 4)
    # all three aligned words have matching heads through the map
    assert m["UAS"]["precision"] == pytest.approx(3 / 4)
    assert m["UAS"]["recall"] == pytest.approx(3 / 4)
