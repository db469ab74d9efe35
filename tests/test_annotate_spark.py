"""Spark annotate-path tests: extraction invariant, segmentation parity,
tree validity, lemma purity, oracle P/R gate (SURVEY.md §5 layers 2-3)."""

import pytest
from pyspark.sql import functions as F

from nlp_cube_spark import oracle
from nlp_cube_spark.datagen import gen_pages, pages_df
from nlp_cube_spark.operators import annotate as A, triples as TR

N_DOCS = 50
SEED = 1234


@pytest.fixture(scope="module")
def pages(spark):
    return pages_df(spark, N_DOCS, seed=SEED).localCheckpoint()


@pytest.fixture(scope="module")
def parsed(spark, pages):
    return A.tag_parse(A.segment(pages)).localCheckpoint()


@pytest.fixture(scope="module")
def words(spark, parsed):
    return A.lemmatize(parsed).localCheckpoint()


def test_extraction_byte_identical(spark, pages):
    ext = A.extract_text(pages)
    assert ext.where(F.col("extracted_text") != F.col("text")).count() == 0


def test_detokenize_invariant(spark, parsed, pages):
    """concat(form + space?) per doc == whitespace-normalized page text
    (reference objects.py:109-115 + tokenizer.py:225-229)."""
    rebuilt = (
        parsed.select(
            "url",
            "sent_id",
            F.expr(
                "aggregate(words, '', (acc, w) -> concat(acc,"
                " case when w.mwt_id > 0 and exists(slice(words, 1,"
                "   int(array_position(words, w)) - 1), p -> p.mwt_id = w.mwt_id)"
                " then '' else w.tok_form end,"
                " case when w.space_after and not (w.mwt_id > 0 and exists(slice(words,"
                "   int(array_position(words, w)) + 1, size(words)), p -> p.mwt_id = w.mwt_id))"
                " then ' ' else '' end))"
            ).alias("stext"),
        )
        .groupBy("url")
        .agg(F.concat_ws("", F.array_sort(F.collect_list(F.struct("sent_id", "stext"))).getField("stext")).alias("rebuilt"))
    )
    joined = rebuilt.join(pages.select("url", "text"), "url")
    bad = joined.where(
        F.trim(F.col("rebuilt")) != F.trim(F.regexp_replace(F.regexp_replace("text", "[\\n\\r]", " "), " {2,}", " "))
    )
    assert bad.count() == 0, bad.limit(3).collect()


def test_every_parse_is_a_tree(spark, words):
    """heads in [0, n], single root per sentence, acyclic (evaluator
    invariants, reference conll18_ud_eval.py:186-209)."""
    n = words.groupBy("url", "sent_id").agg(
        F.max("word_id").alias("n"),
        F.sum(F.when(F.col("head") == 0, 1).otherwise(0)).alias("roots"),
        F.max("head").alias("maxh"),
        F.min("head").alias("minh"),
    )
    assert n.where((F.col("roots") != 1) | (F.col("maxh") > F.col("n")) | (F.col("minh") < 0)).count() == 0


def test_lemma_is_pure_function_of_key(spark, words):
    """(form, upos, lang) -> exactly one lemma (reference utils.py:112-115)."""
    dup = words.groupBy("form", "upos", "lang").agg(F.countDistinct("lemma").alias("k")).where("k > 1")
    assert dup.count() == 0


def test_words_match_oracle_exactly(spark, words):
    got = {
        (r.url, r.sent_id, r.word_id): (r.form, r.lemma, r.upos, r.head, r.deprel)
        for r in words.collect()
    }
    gold_rows, _ = oracle.run_oracle(gen_pages(N_DOCS, seed=SEED))
    gold = {
        (g["url"], g["sent_id"], g["word_id"]): (g["form"], g["lemma"], g["upos"], g["head"], g["deprel"])
        for g in gold_rows
    }
    assert set(got) == set(gold)
    diff = [k for k in gold if got[k] != gold[k]]
    assert len(diff) <= 0.02 * len(gold), diff[:5]


def test_triples_pr_gate(spark, parsed):
    """North-rule gate: triple P/R >= 0.95 vs reference-shaped oracle."""
    trip = TR.extract_triples_nested(parsed)
    sys_t = {(r.url, r.sent_id, r.subj, r.pred, r.obj) for r in trip.collect()}
    _, gold_rows = oracle.run_oracle(gen_pages(N_DOCS, seed=SEED))
    gold = {(g["url"], g["sent_id"], g["subj"], g["pred"], g["obj"]) for g in gold_rows}
    p, r, f = oracle.triple_prf(sys_t, gold)
    assert p >= 0.95 and r >= 0.95, (p, r)


def test_triple_variants_agree(spark, parsed, words):
    """Kernel (scale path), HOF-nested, and self-join variants all agree."""
    kernel = TR.extract_triples_kernel(parsed)
    nested = TR.extract_triples_nested(parsed)
    joined = TR.extract_triples_join(words)
    a = {(r.url, r.sent_id, r.subj, r.pred, r.obj, r.pattern) for r in kernel.collect()}
    b = {(r.url, r.sent_id, r.subj, r.pred, r.obj, r.pattern) for r in nested.collect()}
    c = {(r.url, r.sent_id, r.subj, r.pred, r.obj, r.pattern) for r in joined.collect()}
    assert a == b == c


def test_annotate_fused_equals_modular(spark, pages):
    a = {tuple(r) for r in A.annotate(pages).collect()}
    b = {tuple(r) for r in A.annotate_modular(pages).collect()}
    assert a == b


def test_fused_equals_modular(spark, pages, parsed):
    """Single-stage fused kernel == modular 3-stage chain (scale path
    correctness; the fused variant is what build_graph/bench run)."""
    fused = {
        (r.url, r.sent_id, r.subj, r.pred, r.obj, r.pattern)
        for r in A.fused_triples(pages).collect()
    }
    modular = {
        (r.url, r.sent_id, r.subj, r.pred, r.obj, r.pattern)
        for r in TR.extract_triples_kernel(parsed).collect()
    }
    assert fused == modular


def test_deterministic_across_parallelism(spark, pages):
    """Same triples at 2 vs 8 partitions (scaling-bench prerequisite)."""
    t1 = TR.extract_triples_nested(A.tag_parse(A.segment(pages.repartition(2))))
    t2 = TR.extract_triples_nested(A.tag_parse(A.segment(pages.repartition(8))))
    assert {tuple(r) for r in t1.collect()} == {tuple(r) for r in t2.collect()}


def test_reannotate_pretokenized_roundtrip(spark):
    """Entry point B: strip annotations from the engine's own words table,
    reannotate keeping the tokenization — output equals the original
    (tokenization is the only thing the caller brought)."""
    from nlp_cube_spark.datagen import pages_df
    from nlp_cube_spark.operators import annotate as A

    words = A.annotate(pages_df(spark, 20, seed=4242)).localCheckpoint()
    stripped = words.select(
        "url", "lang", "sent_id", "word_id", "mwt_id", "tok_form",
        F.lit("_").alias("form"), F.lit("_").alias("lemma"),
        F.lit("_").alias("upos"), F.lit("_").alias("xpos"),
        F.lit("_").alias("feats"), F.lit(0).alias("head"),
        F.lit("_").alias("deprel"), "space_after",
    )
    redone = A.reannotate(stripped)
    key = ["url", "sent_id", "word_id", "form", "lemma", "upos", "xpos",
           "feats", "head", "deprel", "mwt_id", "tok_form", "space_after"]
    a = {tuple(r) for r in words.select(*key).collect()}
    b = {tuple(r) for r in redone.select(*key).collect()}
    assert a == b


def test_cube_document_entrypoint(spark):
    """cube(document) — reference entry point B on the eager path."""
    from nlp_cube_spark.api import Cube

    cube = Cube()
    cube.load("en")
    d1 = cube("Alice joins Bob. Bob is a scientist.")
    d2 = cube(d1)  # re-annotate the Document, tokenization preserved
    assert repr(d1) == repr(d2)
    assert d2.sentences[0][1].upos == "VERB"


def test_fused_tags_matches_fused_words(spark):
    """fused_tags (parse-free projection) must agree with fused_words on
    every tag column — same segment/mwt/tag kernels, only the parse is
    skipped."""
    from nlp_cube_spark.datagen import pages_df
    from nlp_cube_spark.operators import annotate as A

    pages = pages_df(spark, 25, seed=31).localCheckpoint()
    cols = ["url", "lang", "sent_id", "word_id", "form", "upos", "xpos", "feats"]
    a = A.fused_tags(pages).select(*cols)
    b = A.fused_words(pages).select(*cols)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    p = A.fused_tags(pages)._jdf.queryExecution().executedPlan().toString()
    assert p.count("MapInPandas") == 1 and p.count("Exchange") == 0
