"""Degenerate web inputs must flow through the whole pipeline, not throw
(found via runtime probing; see .claude/skills/verify/SKILL.md gotchas)."""

import datetime as dt
import shutil
import tempfile

from pyspark.sql import types as T

from nlp_cube_spark.datagen import aliases_df
from nlp_cube_spark.operators import annotate as A
from nlp_cube_spark.plans import pipeline as P

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def _weird(spark):
    rows = [
        ("u1", dt.datetime(2025, 1, 1), b"<html><body>no para</body></html>", "", "en"),
        ("u2", dt.datetime(2025, 1, 1), b"<html><p></p></html>", "   \n\r  ", "en"),
        ("u3", dt.datetime(2025, 1, 1), "<html><p>Ünïcodé tëst . Ça va ?</p></html>".encode(), "Ünïcodé tëst . Ça va ?", "fr"),
        ("u4", dt.datetime(2025, 1, 1), b"<html><p>one two three</p></html>", "one two three", "zz"),
        ("u5", dt.datetime(2025, 1, 1), None, None, "en"),
        ("u6", dt.datetime(2025, 1, 1), b"<html><p>a</p></html>", "a", "en"),
        ("u7", dt.datetime(2025, 1, 1), b"<html><p>....</p></html>", "....", "en"),
        ("u8", dt.datetime(2025, 1, 1), b"<html><p>" + b"x" * 20000 + b"</p></html>", "x" * 20000, "en"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_degenerate_pages_through_full_pipeline(spark):
    out = tempfile.mkdtemp(prefix="kg_weird_")
    try:
        m = P.build_graph(spark, _weird(spark), aliases_df(spark), out, n_buckets=2, run_id=1)
        assert m["n_pages"] == 8
        tri = spark.read.parquet(f"{out}/triples")
        assert tri.count() >= 0  # no throw is the contract
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_degenerate_pages_extraction(spark):
    ext = A.extract_text(_weird(spark)).collect()
    got = {r.url: r.extracted_text for r in ext}
    assert got["u1"] == "" and got["u5"] == ""
    assert got["u3"] == "Ünïcodé tëst . Ça va ?"
    assert got["u8"] == "x" * 20000


def test_single_char_and_punct_only_docs(spark):
    words = A.annotate(_weird(spark).where("url in ('u6','u7')"))
    rows = words.collect()
    # "a" -> one word; "...." -> 4 punct tokens across 4 sentences
    assert {r.url for r in rows} == {"u6", "u7"}
    u7 = [r for r in rows if r.url == "u7"]
    assert all(r.upos == "PUNCT" for r in u7)


def test_sessionize_degenerate(spark):
    from nlp_cube_spark.operators.sessions import sessionize

    empty = spark.createDataFrame([], "user_id long, ts timestamp, value double")
    assert sessionize(empty).count() == 0
    one = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 2.0)], "user_id long, ts timestamp, value double"
    )
    rows = sessionize(one).collect()
    assert len(rows) == 1 and rows[0].n_events == 1


def test_cosine_near_dups_zero_vector_no_crash(spark):
    """Zero-norm embeddings produce NaN cosines; they must be filtered,
    never crash or surface as pairs."""
    from nlp_cube_spark.operators import similarity as S

    rows = [
        (1, [0.0] * 8),
        (2, [0.0] * 8),
        (3, [1.0] + [0.0] * 7),
        (4, [1.0] + [0.0] * 7),
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r.vec_a, r.vec_b) for r in S.cosine_near_dups(vecs, dim=8, threshold=0.99).collect()}
    assert (3, 4) in got
    assert all(1 not in p and 2 not in p for p in got)


def test_jaccard_verify_empty_pairs(spark):
    from nlp_cube_spark.operators import dedup as D

    docs = spark.createDataFrame([(1, "alpha beta", "en")], "doc_id long, text string, lang string")
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    assert D.jaccard_verify_pairs(pairs, docs).count() == 0


def test_pathological_long_sentence_parse_capped(spark):
    """One bad web page must not straggle/OOM an executor: sentences above
    MAX_PARSE_LEN parse in independent chunks stitched with 'parataxis' to
    the sentence root — still exactly one root, all heads in range, and
    time/memory linear in length (the uncapped O(n^2) matrix at 32k tokens
    would be ~8 GB)."""
    from nlp_cube_spark.operators import annotate as A

    text = " ".join(["data join table"] * (32000 // 3))
    pages = spark.createDataFrame([("u1", "en", text)], "url string, lang string, text string")
    rows = A.fused_words(pages).select("word_id", "head", "deprel").collect()
    n = len(rows)
    assert n == 3 * (32000 // 3)  # one giant sentence, all words present
    roots = [r for r in rows if r.head == 0]
    assert len(roots) == 1
    assert all(0 <= r.head <= n for r in rows)
    assert sum(1 for r in rows if r.deprel == "parataxis") == (n - 1) // A.MAX_PARSE_LEN


def test_parse_cap_boundary_parity():
    """Sentences at or below the cap parse identically to the uncapped
    path (the chunked branch only engages above MAX_PARSE_LEN)."""
    from nlp_cube_spark.kernels import arc_scores, mst
    from nlp_cube_spark.operators import annotate as A

    forms = ["the", "fox", "admires", "a", "dog"] * 20  # 100 words, << cap
    upos = [t[0] for t in __import__("nlp_cube_spark.kernels.tagger_rules", fromlist=["x"]).tag_sentence(forms, "en")]
    capped_heads, capped_labels = A._parse_capped(forms, upos, arc_scores.score_matrix)
    plain = mst.decode_tree(arc_scores.score_matrix(forms, upos)).tolist()
    assert capped_heads == plain
    assert capped_labels == arc_scores.label_arcs(forms, upos, plain)


def test_r6_new_ops_degenerate_inputs(spark):
    """Empty/degenerate inputs must yield empty or NULL-safe results,
    not throw: semdedup on empty vectors, k_core/k_truss on empty and
    NULL-ridden edges, winnowing on empty text, bigram LM on empty
    docs, unimax on a single source."""
    from nlp_cube_spark.operators.dedup import winnow_fingerprints, winnow_match_pairs
    from nlp_cube_spark.operators.graphstats import k_core, k_truss
    from nlp_cube_spark.operators.similarity import semdedup
    from nlp_cube_spark.operators.textstats import bigram_backoff_scores, unimax_weights

    empty_vecs = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert semdedup(empty_vecs, n_clusters=4, iters=1).count() == 0

    empty_edges = spark.createDataFrame([], "src string, dst string")
    assert k_core(empty_edges, k=2).count() == 0
    assert k_truss(empty_edges, t=3).count() == 0
    nullish = spark.createDataFrame(
        [(None, "a"), ("a", None), ("a", "a")], "src string, dst string"
    )
    assert k_core(nullish, k=1).count() == 0  # only self-loop/NULL edges
    assert k_truss(nullish, t=3).count() == 0

    weird_docs = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "ok tiny")],
        "doc_id long, text string",
    )
    assert winnow_fingerprints(weird_docs).where("doc_id <= 3").count() == 0
    assert winnow_match_pairs(weird_docs).count() == 0
    lm = bigram_backoff_scores(weird_docs)
    rows = {r.doc_id: r for r in lm.collect()}
    assert rows[1].n_bigrams == 0 and rows[1].lm_score is None
    assert rows[3].n_bigrams == 0

    one_source = spark.createDataFrame(
        [(1, "abc", "A"), (2, "defg", "A")], "doc_id long, text string, source string"
    )
    um = unimax_weights(one_source, budget_frac=0.5, max_epochs=2.0).collect()
    assert len(um) == 1 and um[0].alloc_chars == 3.5  # uncapped: budget = 7*0.5
