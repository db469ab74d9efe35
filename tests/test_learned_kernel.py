"""Pinned-weight learned-kernel seam proof (SURVEY.md §7 step 4).

The micro-parser (kernels/learned.py, frozen committed weights) swaps into
the arc-score seam and must (a) reproduce the rule kernel's heads on
held-out seeds, (b) produce IDENTICAL engine output through the fused
Spark stages, (c) change nothing about the plan."""

from pyspark.sql import functions as F

from nlp_cube_spark.datagen import gen_pages, pages_df
from nlp_cube_spark.kernels import learned, mst
from nlp_cube_spark.operators import annotate as A
from nlp_cube_spark.operators.annotate import _annotate_doc

HELDOUT_SEED = 31337  # never used by datagen fixtures or training


def test_learned_heads_match_rules_on_heldout():
    n_sents = 0
    for page in gen_pages(80, seed=HELDOUT_SEED):
        for forms, _sp, _mw, _tf, tags, rule_heads, _lb in _annotate_doc(page["text"], page["lang"]):
            upos = [t[0] for t in tags]
            probs = learned.score_matrix(forms, upos)
            heads = mst.decode_tree(probs).tolist()
            assert heads == [int(h) for h in rule_heads], (forms, upos)
            n_sents += 1
    assert n_sents > 100


def test_learned_scorer_same_engine_output(spark):
    pages = pages_df(spark, 40, seed=HELDOUT_SEED).localCheckpoint()
    rules = A.fused_triples(pages)
    learned_df = A.fused_triples(pages, scorer="learned")
    assert rules.exceptAll(learned_df).count() == 0
    assert learned_df.exceptAll(rules).count() == 0

    w_rules = A.annotate(pages)
    w_learned = A.annotate(pages, scorer="learned")
    assert w_rules.exceptAll(w_learned).count() == 0
    assert w_learned.exceptAll(w_rules).count() == 0


def test_learned_scorer_changes_no_plan(spark):
    pages = pages_df(spark, 5, seed=HELDOUT_SEED)
    p_rules = A.fused_triples(pages)._jdf.queryExecution().executedPlan().toString()
    p_learn = A.fused_triples(pages, scorer="learned")._jdf.queryExecution().executedPlan().toString()

    assert p_rules.count("MapInPandas") == p_learn.count("MapInPandas") == 1
    assert p_rules.count("Exchange") == p_learn.count("Exchange")


def test_score_matrix_contract():
    """Row-stochastic (n+1, n+1), row/col 0 = ROOT — the exact contract
    mst.decode_tree consumes (same as arc_scores.score_matrix)."""
    import numpy as np

    upos = ["PROPN", "VERB", "PROPN"]
    m = learned.score_matrix(["Alice", "joins", "Bob"], upos)
    assert m.shape == (4, 4)
    assert np.allclose(m[1:].sum(axis=1), 1.0)
    assert m[0, 0] == 1.0


def test_learned_tagger_and_boundary_match_rules_on_heldout():
    from nlp_cube_spark.kernels import segment_rules, tagger_rules
    from nlp_cube_spark.kernels.pretokenizer import normalize_ws, pretokenize

    n_words = n_toks = 0
    for page in gen_pages(80, seed=HELDOUT_SEED):
        lang = page["lang"]
        norm = normalize_ws(page["text"])
        toks, spa = pretokenize(norm, no_space_lang=segment_rules.is_no_space_lang(lang))
        assert learned.classify(toks, spa, lang) == segment_rules.classify(toks, spa, lang)
        n_toks += len(toks)
        for forms, *_ in _annotate_doc(page["text"], lang):
            assert learned.tag_sentence(forms, lang) == tagger_rules.tag_sentence(forms, lang)
            n_words += len(forms)
    assert n_words > 1000 and n_toks > 1000


def test_all_three_learned_kernels_same_engine_output(spark):
    """Full model-shaped pipeline: boundary + tagger + parser all swapped
    to pinned-weight micro-models at once — identical engine output and
    identical plan to the rule pipeline."""
    pages = pages_df(spark, 30, seed=HELDOUT_SEED).localCheckpoint()
    rules = A.fused_triples(pages)
    learned_df = A.fused_triples(pages, scorer="learned", tagger="learned", boundary="learned")
    assert rules.exceptAll(learned_df).count() == 0
    assert learned_df.exceptAll(rules).count() == 0
    p_r = rules._jdf.queryExecution().executedPlan().toString()
    p_l = learned_df._jdf.queryExecution().executedPlan().toString()
    assert p_r.count("MapInPandas") == p_l.count("MapInPandas") == 1
    assert p_r.count("Exchange") == p_l.count("Exchange")
