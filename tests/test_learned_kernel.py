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


def test_learned_mwt_matches_dictionary_on_fixture_langs():
    """Every dictionary entry the fixtures can produce must expand
    identically through the learned edit-program classifier."""
    from nlp_cube_spark.kernels import segment_rules

    for lang, table in segment_rules.MWT_LEXICON.items():
        for form, words in table.items():
            assert learned.expand_mwt(form, lang) == words, (lang, form)


def test_learned_mwt_expands_non_dictionary_forms():
    """The seq2seq-shaped capability the dictionary cannot have: surface
    forms ABSENT from MWT_LEXICON (and from the trainer's pair list) expand
    via shared edit-program classes; unknown shapes pass through."""
    from nlp_cube_spark.kernels import segment_rules

    assert "das" not in segment_rules.MWT_LEXICON.get("pt", {})
    assert learned.expand_mwt("das", "pt") == ["de", "as"]
    assert learned.expand_mwt("nas", "pt") == ["em", "as"]
    # identity fallback for unseen non-contraction shapes
    assert learned.expand_mwt("zzzqx", "pt") == ["zzzqx"]
    assert learned.expand_mwt("table", "en") == ["table"]


def test_learned_mwt_same_engine_output_and_plan(spark):
    pages = pages_df(spark, 30, seed=HELDOUT_SEED).localCheckpoint()
    d = A.fused_triples(pages)
    l = A.fused_triples(pages, mwt="learned")
    assert d.exceptAll(l).count() == 0 and l.exceptAll(d).count() == 0
    p_d = d._jdf.queryExecution().executedPlan().toString()
    p_l = l._jdf.queryExecution().executedPlan().toString()
    assert p_d.count("MapInPandas") == p_l.count("MapInPandas") == 1
    assert p_d.count("Exchange") == p_l.count("Exchange")


def _mwt_gold(spark):
    """One pt sentence whose tokenization contains the NON-dictionary MWT
    'das' expanded to (de, as) — entry-point-B gold."""
    from nlp_cube_spark.io.conllu import WORDS_SCHEMA

    rows = [
        ("u1", "pt", 0, 1, 0, "Ana", "Ana", "ana", "PROPN", "NNP", "_", 4, "nsubj", True),
        ("u1", "pt", 0, 2, 2, "das", "de", "de", "ADP", "IN", "_", 4, "case", True),
        ("u1", "pt", 0, 3, 2, "das", "as", "a", "DET", "DT", "_", 4, "det", True),
        ("u1", "pt", 0, 4, 0, "casas", "casas", "casa", "NOUN", "NN", "_", 0, "root", False),
        ("u1", "pt", 0, 5, 0, ".", ".", ".", "PUNCT", ".", "_", 4, "punct", False),
    ]
    data = [
        dict(zip(
            ("url", "lang", "sent_id", "word_id", "mwt_id", "tok_form", "form",
             "lemma", "upos", "xpos", "feats", "head", "deprel", "space_after"),
            r,
        ))
        for r in rows
    ]
    return spark.createDataFrame(data, WORDS_SCHEMA).localCheckpoint()


def test_non_dictionary_mwt_flows_through_engine_and_lcs(spark):
    """VERDICT r3 item 5 'done' condition: a non-dictionary expansion flows
    through the engine (entry point B, mwt='learned') AND the dictionary
    path forces the evaluator's LCS alignment inside the MWT region."""
    from nlp_cube_spark.operators import evaluate as EV

    gold = _mwt_gold(spark)
    sys_learned = A.reannotate(gold, mwt="learned").localCheckpoint()
    got = {(r.word_id, r.form, r.mwt_id) for r in sys_learned.collect()}
    assert (2, "de", 2) in got and (3, "as", 2) in got, got  # the expansion itself
    m = EV.evaluate(sys_learned, gold)
    assert m["Tokens"]["f1"] == 1.0 and m["Words"]["f1"] == 1.0

    # dictionary expander cannot expand 'das': word counts differ in the MWT
    # region, so scoring REQUIRES the LCS alignment path (a crash or 0 score
    # here would mean the region was never aligned)
    sys_dict = A.reannotate(gold, mwt="dict").localCheckpoint()
    assert sys_dict.count() == 4  # das stayed one word
    m2 = EV.evaluate(sys_dict, gold)
    assert m2["Tokens"]["f1"] == 1.0  # surface tokenization still matches
    assert m2["Words"]["f1"] < 1.0  # 4 system words vs 5 gold words


def test_learned_lemmatizer_matches_rules_on_heldout():
    """The last neural stage gets its pinned-weight counterpart (reference
    lemmatizer.py:78-171 incl. recasing :216-222): edit-script
    classification must reproduce the rule lemmatizer on every distinct
    (form, upos, lang) key of held-out pages."""
    from nlp_cube_spark.kernels import lemma_rules

    keys = set()
    for page in gen_pages(80, seed=HELDOUT_SEED):
        for forms, _sp, _mw, _tf, tags, _hd, _lb in _annotate_doc(page["text"], page["lang"]):
            for form, (u, _x, _f) in zip(forms, tags):
                keys.add((form, u, page["lang"]))
    assert len(keys) > 50
    for form, upos, lang in sorted(keys):
        assert learned.lemmatize(form, upos, lang) == lemma_rules.lemmatize(form, upos, lang), (
            form, upos, lang,
        )


def test_edit_script_roundtrip_properties():
    """edit_script/apply_edit invert each other on representative shapes:
    suffix strips, irregulars (full rewrite), recasing classes, identity."""
    cases = [
        ("walks", "walk"), ("cities", "city"), ("is", "be"), ("Alice", "Alice"),
        ("RUNNING", "run"), ("3.5", "3.5"), (".", "."), ("está", "estar"),
        ("McDonald", "Mcdonald"), ("", ""),
    ]
    for form, lemma in cases:
        cls = learned.edit_script(form, lemma)
        assert learned.apply_edit(form, cls) == lemma, (form, lemma, cls)


def test_all_four_learned_kernels_same_words_table(spark):
    """annotate() with every seam on 'learned' (boundary+tagger+parser+
    lemmatizer) — bit-identical words table and identical plan (the lemma
    stage stays one dedup + broadcast join either way)."""
    pages = pages_df(spark, 30, seed=HELDOUT_SEED).localCheckpoint()
    w_rules = A.annotate(pages)
    w_learned = A.annotate(
        pages, scorer="learned", tagger="learned", boundary="learned", lemmatizer="learned"
    )
    assert w_rules.exceptAll(w_learned).count() == 0
    assert w_learned.exceptAll(w_rules).count() == 0
    p_r = w_rules._jdf.queryExecution().executedPlan().toString()
    p_l = w_learned._jdf.queryExecution().executedPlan().toString()
    assert p_r.count("MapInPandas") == p_l.count("MapInPandas")
    assert p_r.count("BroadcastHashJoin") == p_l.count("BroadcastHashJoin")
    assert p_r.count("Exchange") == p_l.count("Exchange")


def test_all_learned_kernels_parity_on_salad_documents(spark):
    """The driver corpus is word-salad documents, a DIFFERENT distribution
    from the fixture grammar: r3 found fixture-trained micro-models
    diverged on 36% of salad tags. Trainers now cover the salad
    distribution exhaustively (tagger/boundary/lemmatizer: every feature
    vector the closed vocab can produce; parser: gated on full-corpus MST
    parity), so every learned seam must reproduce the rules pipeline
    bit-for-bit on real documents."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .selectExpr("concat('https://ex.org/doc/', doc_id) AS url", "text", "lang")
        .localCheckpoint()
    )
    w_rules = A.fused_words(docs)
    w_learned = A.fused_words(docs, scorer="learned", tagger="learned", boundary="learned")
    assert w_rules.exceptAll(w_learned).count() == 0
    assert w_learned.exceptAll(w_rules).count() == 0


def test_vocab_coverage_metric_closed_and_oov(spark):
    """The committed closed-vocab boundary stat (round-4 VERDICT item 5):
    on the sf corpus every distinct (form, upos, lang) key must hit the
    learned kernels' exact vocabulary with rules agreement 1.0 (that is
    the basis of the exact-parity claim), and on a deterministic OOV set
    the metric documents the shape-generalization fallback quality."""
    import importlib.util
    import pathlib

    def load_script(name):
        p = pathlib.Path(__file__).parent.parent / "scripts" / f"{name}.py"
        spec = importlib.util.spec_from_file_location(name, p)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    tl = load_script("train_micro_lemmatizer")
    tm = load_script("train_micro_mwt")
    lemma_train = set(tl.lemma_keys(400, 7)) | set(tl.salad_keys())  # trainer defaults
    mwt_train = {(lang, surface.lower()) for lang, surface, _ in tm.TRAIN_PAIRS}

    words = A.fused_words(
        spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
        .selectExpr("concat('https://ex.org/doc/', doc_id) AS url", "text", "lang")
    )
    keys = [(r.form, r.upos, r.lang) for r in
            words.select("form", "upos", "lang").dropDuplicates().collect()]
    cov = learned.vocab_coverage(keys, lemma_train, mwt_train)
    assert cov["n_keys"] > 0
    assert cov["lemma_exact_frac"] == 1.0
    assert cov["lemma_rules_agree_frac"] == 1.0
    assert cov["mwt_rules_agree_frac"] == 1.0

    # sf0.1 uses the SAME closed salad vocabulary, so the sf0.01 stat
    # transfers verbatim — checked on forms, not assumed
    toks_001 = {r.t for r in spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
                .select(F.explode(F.split("text", " ")).alias("t")).dropDuplicates().collect()}
    toks_01 = {r.t for r in spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
               .select(F.explode(F.split("text", " ")).alias("t")).dropDuplicates().collect()}
    assert toks_01 <= toks_001

    # OOV: mutated forms that the trainers never saw ride the suffix/shape
    # path; the metric records (not hides) the boundary. Identity-program
    # MWT passthrough must hold for every unseen form.
    oov = [(f + "zq", u, lg) for f, u, lg in keys[:50]]
    cov_oov = learned.vocab_coverage(oov, lemma_train, mwt_train)
    assert cov_oov["lemma_exact_frac"] == 0.0
    # OOV forms are NOT guaranteed identity/rules-parity — they ride shape
    # sharing (a form overlapping a contraction's shape features can
    # mis-expand). The floors below are the documented boundary
    # (COVERAGE.md); raising them means retraining with wider coverage.
    assert cov_oov["mwt_rules_agree_frac"] >= 0.95
    assert cov_oov["lemma_rules_agree_frac"] >= 0.5


# Genuinely open-vocabulary corpus (round-4 VERDICT "Missing #3"): ordinary
# English web-text sentences whose content words the trainers never saw —
# not mutations of trained keys. The full pipeline runs over it and
# vocab_coverage measures the shape-generalization fallback. Measured
# numbers are committed in COVERAGE.md.
OPEN_SENTS = [
    "Distributed systems replicate logs across machines and partitions.",
    "The optimizer rewrites expressions before executing stages eagerly.",
    "Caching layers absorbed bursts while coordinators rebalanced shards.",
    "Engineers profiled latencies and tuned schedulers during migrations.",
    "Compressed pages streamed through decoders into columnar buffers.",
    "Vectorized kernels computed aggregates over nested structures quickly.",
    "Crawlers fetched documents, parsed markup, and extracted entities.",
    "Embeddings clustered tokens into neighborhoods of similar meanings.",
    "Checkpoints guaranteed recovery after failures interrupted workers.",
    "Planners estimated cardinalities using sampled histograms and sketches.",
    "Indexes accelerated lookups when predicates matched sorted columns.",
    "Pipelines transformed records, deduplicated entries, and emitted batches.",
    "Monitors alerted operators whenever throughput degraded suddenly.",
    "Compilers generated bytecode and fused operators into tight loops.",
    "Researchers trained models, evaluated metrics, and published findings.",
]


def test_vocab_coverage_on_open_vocabulary_corpus(spark):
    """The fallback-quality number exercised on a corpus whose keys are NOT
    exhaustively trained (round-4 VERDICT item 4): >=90% of the distinct
    (form, upos, lang) keys must be outside the lemma train set, and the
    measured rules-agreement fractions must stay at or above the committed
    COVERAGE.md floors. The keys come from the real Spark pipeline
    (fused_words), not a hand list, so tokenization/tagging of unseen text
    is part of what is exercised."""
    import importlib.util
    import pathlib

    def load_script(name):
        p = pathlib.Path(__file__).parent.parent / "scripts" / f"{name}.py"
        spec = importlib.util.spec_from_file_location(name, p)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    tl = load_script("train_micro_lemmatizer")
    tm = load_script("train_micro_mwt")
    lemma_train = set(tl.lemma_keys(400, 7)) | set(tl.salad_keys())
    mwt_train = {(lang, surface.lower()) for lang, surface, _ in tm.TRAIN_PAIRS}

    docs = spark.createDataFrame(
        [(f"https://open.example/{i}", s, "en") for i, s in enumerate(OPEN_SENTS)],
        "url string, text string, lang string",
    )
    words = A.fused_words(docs)
    keys = [(r.form, r.upos, r.lang) for r in
            words.select("form", "upos", "lang").dropDuplicates().collect()]
    cov = learned.vocab_coverage(keys, lemma_train, mwt_train)
    assert cov["n_keys"] >= 100
    oov_frac = 1.0 - cov["lemma_exact_frac"]
    assert oov_frac >= 0.9  # genuinely open vocabulary, not a mutation set
    # committed floors (COVERAGE.md r5). Pre-fix baseline was 0.9554 /
    # 0.8661; the verbatim-identity MWT program + the trainer's
    # suffix-shape battery (disjoint from OPEN_SENTS) raised the measured
    # numbers to 0.9911 / 1.0 — the one residual miss ('across' NOUN,
    # '-ss' shape at an untrained length) is the documented boundary.
    assert cov["lemma_rules_agree_frac"] >= 0.98
    assert cov["mwt_rules_agree_frac"] >= 0.99
    # the GENERATIVE transducer path (r6): full agreement — suffix-rule
    # induction composes the edit programs the classifier could only
    # memorize, so the open-vocab gap ('across' NOUN in r5) is closed
    assert cov["lemma_transducer_agree_frac"] == 1.0
    assert cov["mwt_transducer_agree_frac"] == 1.0


# disjoint from OPEN_SENTS (and from the trainers' batteries): the
# "new disjoint corpus" half of the r5 verdict's done-criterion
OPEN_SENTS_2 = [
    "Quarterly audits revealed misconfigured replicas hoarding snapshots.",
    "Gateways throttled noisy tenants while routers balanced regions.",
    "Annotators labelled utterances and reviewers corrected disagreements.",
    "Freshness probes detected staleness whenever upstream feeds lagged.",
    "Garbage collectors compacted arenas between allocation bursts.",
    "Tokenizers normalized ligatures before embedding layers consumed them.",
    "Dashboards aggregated counters, histograms, and gauges hourly.",
    "Retries amplified congestion until backoffs spread the arrivals.",
    "Licensing restricted redistribution of derived lexicons abroad.",
    "Couriers delivered parcels across boroughs despite closures.",
]


def test_transducer_full_agreement_on_disjoint_open_corpus(spark):
    """Lemma transducer agreement 1.0 on a SECOND open corpus disjoint
    from OPEN_SENTS and every trainer battery; keys come through the
    real fused pipeline so tokenization/tagging of unseen text is
    exercised too."""
    docs = spark.createDataFrame(
        [(f"https://open2.example/{i}", s, "en") for i, s in enumerate(OPEN_SENTS_2)],
        "url string, text string, lang string",
    )
    words = A.fused_words(docs)
    keys = [(r.form, r.upos, r.lang) for r in
            words.select("form", "upos", "lang").dropDuplicates().collect()]
    assert len(keys) >= 60
    cov = learned.vocab_coverage(keys)
    assert cov["lemma_transducer_agree_frac"] == 1.0
    assert cov["mwt_transducer_agree_frac"] == 1.0


def test_transducer_closes_r5_residual_and_composes_unseen_programs():
    """The r5 documented boundary: 'across' NOUN (an -ss shape at an
    untrained length) misclassified under the perceptron; the induced
    suffix rules must get it — plus novel inflections whose exact edit
    programs were never seen as training CLASSES, only composed from
    suffix evidence."""
    from nlp_cube_spark.kernels import lemma_rules

    assert learned.transduce_lemma("across", "NOUN", "en") == "across"
    # novel forms at assorted lengths/shapes: exact lemma_rules parity
    for form, upos in [
        ("acrosses", "NOUN"), ("bivouacking", "VERB"), ("quizzes", "NOUN"),
        ("Xylophones", "NOUN"), ("REPLAYED", "VERB"), ("smallnesses", "NOUN"),
        ("Zanzibar", "PROPN"), ("qwrtzed", "VERB"), ("moss", "NOUN"),
        ("gas", "NOUN"), ("dies", "VERB"), ("bed", "VERB"), ("sing", "VERB"),
    ]:
        for lang in ("en", "es", "zh"):
            got = learned.transduce_lemma(form, upos, lang)
            want = lemma_rules.lemmatize(form, upos, lang)
            assert got == want, (form, upos, lang, got, want)
    # es/pt verb-infinitive restoration on unseen stems
    assert learned.transduce_lemma("zumba", "VERB", "es") == "zumbar"
    assert learned.transduce_lemma("bebe", "VERB", "pt") == "beber"


def test_transducer_property_parity_with_rules():
    """Randomized battery (fresh seed, disjoint from the trainer's 13/99):
    the induced rules must equal lemma_rules on arbitrary letter forms —
    the transducer's open-vocabulary guarantee, sampled afresh every run
    would flake, so the seed is fixed but distinct."""
    import random

    from nlp_cube_spark.kernels import lemma_rules

    rng = random.Random(20260817)
    upos_pool = ["NOUN", "VERB", "PROPN", "AUX", "ADV", "PUNCT", "NUM", "X"]
    for _ in range(3000):
        n = rng.randint(1, 13)
        form = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(n))
        style = rng.random()
        if style < 0.2:
            form = form.capitalize()
        elif style < 0.3:
            form = form.upper()
        upos = rng.choice(upos_pool)
        lang = rng.choice(["en", "de", "es", "fr", "pt", "zh"])
        got = learned.transduce_lemma(form, upos, lang)
        want = lemma_rules.lemmatize(form, upos, lang)
        assert got == want, (form, upos, lang, got, want)


def test_mwt_transducer_dictionary_heldout_and_identity():
    """Whole dictionary verbatim; held-out contractions expand via shape
    sharing (the generative property the dict lacks); ordinary unseen
    words pass through VERBATIM (casing preserved)."""
    from nlp_cube_spark.kernels.segment_rules import MWT_LEXICON

    for lang, entries in MWT_LEXICON.items():
        for surface, words in entries.items():
            assert learned.transduce_mwt(surface, lang) == words, (lang, surface)
    # held-out generalizations (same contract as the learned expander)
    assert learned.transduce_mwt("das", "pt") == ["de", "as"]
    assert learned.transduce_mwt("nas", "pt") == ["em", "as"]
    for form in ("Table", "window", "QUERY", "zzzqqq"):
        assert learned.transduce_mwt(form, "en") == [form]
        assert learned.transduce_mwt(form, "zh") == [form]


def test_transducer_through_engine_matches_rules_lemmas(spark):
    """Engine seam proof: annotate(lemmatizer='transducer') must produce
    byte-identical words tables to the rules path on fixture pages (the
    transducer's corpus-parity gate, exercised through the real Spark
    dedup-broadcast-join stage), and the MWT seam must accept
    'transducer' through the fused kernel."""
    pages = pages_df(spark, 12, seed=HELDOUT_SEED)
    a = A.annotate(pages).select("url", "sent_id", "word_id", "form", "lemma")
    b = A.annotate(pages, lemmatizer="transducer").select(
        "url", "sent_id", "word_id", "form", "lemma"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    w = A.fused_words(pages, mwt="transducer")
    w2 = A.fused_words(pages)
    assert [tuple(r) for r in w.orderBy("url", "sent_id", "word_id").collect()] == [
        tuple(r) for r in w2.orderBy("url", "sent_id", "word_id").collect()
    ]
