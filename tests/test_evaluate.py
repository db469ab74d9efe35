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
