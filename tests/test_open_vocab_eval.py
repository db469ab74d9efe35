"""Entry point B at open-vocabulary scale (r6 verdict item 6): the
serialize -> read_conllu -> reannotate -> evaluate round trip must stay
EXACT on a corpus whose vocabulary the micro-model trainers never saw
(datagen.open_pages: pseudo-English, ~99.97% of distinct keys OOV at the
measured 900-doc / 126k-word run — numbers committed in COVERAGE.md;
scripts/eval_open_vocab.py reproduces them).  This test runs the same
path at 80 docs (~11k words) inside the suite and asserts the committed
floors."""

from scripts.eval_open_vocab import run


def test_entry_b_open_vocab_floors(spark):
    res = run(spark, n_docs=80, seed=777)
    assert res["n_words"] >= 10_000
    m = res["metrics_f1"]
    # the round trip is deterministic: every span/word metric is exact
    for name in ("Tokens", "Sentences", "Words", "UPOS", "Lemmas", "UAS", "LAS"):
        assert m[name] == 1.0, (name, m[name])
    cov = res["vocab_coverage"]
    assert cov["lemma_exact_frac"] < 0.05  # genuinely open vocabulary
    # committed generalization floors (measured r7: 0.9975 / 1.0 / 1.0)
    assert cov["lemma_rules_agree_frac"] >= 0.99
    assert cov["lemma_transducer_agree_frac"] >= 0.999
    assert cov["mwt_transducer_agree_frac"] >= 0.999
