"""Hard parity: our distributed evaluator vs the REFERENCE conll18 script.

The reference's cube/misc/conll18_ud_eval.py is pure Python (no torch); when
present it is loaded AS A TEST-TIME ORACLE ONLY (never imported by package
code — the repo stays standalone; this module skips cleanly without it).
Both evaluators consume the same serialized CoNLL-U text; all 13 metrics'
precision/recall/F1 must agree to 1e-9 under several perturbations,
including an MWT-expansion change that forces the LCS alignment path.
"""

import importlib.util
import io
import os

import pytest
from pyspark.sql import functions as F

from nlp_cube_spark.datagen import pages_df
from nlp_cube_spark.io import conllu as CU
from nlp_cube_spark.operators import annotate as A, evaluate as EV

REF = "/root/reference/cube/misc/conll18_ud_eval.py"

pytestmark = pytest.mark.skipif(not os.path.exists(REF), reason="reference evaluator not available")


@pytest.fixture(scope="module")
def ref_eval():
    spec = importlib.util.spec_from_file_location("conll18_ud_eval", REF)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.fixture(scope="module")
def system_words(spark):
    return A.annotate(pages_df(spark, 30, seed=6060)).localCheckpoint()


def _concat_conllu(words_df) -> str:
    rows = CU.serialize_words(words_df).orderBy("url").collect()
    return "".join(r.conllu + "\n" for r in rows)


def _ref_metrics(ref_eval, gold_txt: str, sys_txt: str) -> dict:
    gold = ref_eval.load_conllu(io.StringIO(gold_txt))
    sys_ = ref_eval.load_conllu(io.StringIO(sys_txt))
    out = {}
    for k, s in ref_eval.evaluate(gold, sys_).items():
        out[k] = {"precision": s.precision, "recall": s.recall, "f1": s.f1}
    return out


def _assert_match(ours: dict, ref: dict):
    assert set(ours) == set(ref)
    for k in ref:
        for fld in ("precision", "recall", "f1"):
            assert ours[k][fld] == pytest.approx(ref[k][fld], abs=1e-9), (k, fld, ours[k], ref[k])


def _roundtrip(spark, words_df):
    """Serialize+parse so both evaluators see EXACTLY the same documents."""
    rows = []
    for r in CU.serialize_words(words_df).collect():
        rows.extend(CU.parse_conllu_text(r.conllu, url=r.url, lang="x"))
    return spark.createDataFrame(rows, CU.WORDS_SCHEMA).localCheckpoint()


def test_parity_self(spark, ref_eval, system_words):
    txt = _concat_conllu(system_words)
    ours = EV.evaluate(system_words, system_words)
    _assert_match(ours, _ref_metrics(ref_eval, txt, txt))


def test_parity_tag_and_head_perturbations(spark, ref_eval, system_words):
    broken = system_words.withColumn(
        "upos", F.when(F.col("upos") == "NOUN", "X").otherwise(F.col("upos"))
    ).withColumn(
        "head",
        F.when(F.col("deprel") == "obj", F.lit(0)).otherwise(F.col("head")),
    ).withColumn(
        "lemma", F.when(F.col("deprel") == "nsubj", F.lit("WRONG")).otherwise(F.col("lemma")),
    )
    ours = EV.evaluate(broken, system_words)
    ref = _ref_metrics(ref_eval, _concat_conllu(system_words), _concat_conllu(broken))
    _assert_match(ours, ref)


def test_parity_mwt_lcs_path(spark, ref_eval, system_words):
    """Change MWT expansions on the system side ('el' -> 'lo'): the span
    sets inside those tokens diverge and the reference goes through its
    LCS alignment — ours must produce identical numbers."""
    es = system_words
    broken = es.withColumn(
        "form",
        F.when((F.col("mwt_id") > 0) & (F.col("form") == "el"), "lo").otherwise(F.col("form")),
    )
    # round-trip both sides so serialization policies are identical inputs
    sys_rt = _roundtrip(spark, broken)
    gold_rt = _roundtrip(spark, es)
    ours = EV.evaluate(sys_rt, gold_rt)
    ref = _ref_metrics(ref_eval, _concat_conllu(gold_rt), _concat_conllu(sys_rt))
    assert ours["Words"]["f1"] < 1.0  # the perturbation really bit
    _assert_match(ours, ref)
