"""C4 line filtering / Gopher quality gates / per-source caps
(operators/webclean): planted hand-checkable fixtures + degenerate
inputs.  Full cross-engine replay runs in test_entry_queries
(doc_c4_lines / doc_gopher_quality / docs_capped_per_source)."""

from nlp_cube_spark.operators import webclean as W


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_c4_line_verdicts_each_rule(spark):
    text = "\n".join(
        [
            "This line is perfectly fine and ends well.",  # keep
            "no terminal punctuation here",  # no_terminal_punct
            "Too short.",  # too_short (2 words)
            "A line with { a brace } inside it.",  # brace
            "This page uses Lorem Ipsum placeholder text everywhere.",  # blocklist
            "",  # empty
            'He said "stop".',  # keep (quote counts as terminal)
        ]
    )
    v = {r.line_id: r for r in W.c4_line_verdicts(_docs(spark, [(1, text)])).collect()}
    assert v[0].keep and v[0].reason is None
    assert v[1].reason == "no_terminal_punct"
    assert v[2].reason == "too_short" and v[2].n_words == 2
    assert v[3].reason == "brace"
    assert v[4].reason == "blocklist"
    assert v[5].reason == "empty"
    assert v[6].keep
    # rule order: a 2-word line WITHOUT punctuation reports punct first
    v2 = W.c4_line_verdicts(_docs(spark, [(2, "tiny line")])).collect()[0]
    assert v2.reason == "no_terminal_punct"


def test_c4_clean_docs_reassembly_and_min_lines(spark):
    docs = _docs(
        spark,
        [
            (1, "Keep this first line.\nnot kept\nAnd keep this second line."),
            (2, "nothing survives here\nat all"),
        ],
    )
    out = {r.doc_id: r for r in W.c4_clean_docs(docs).collect()}
    assert out[1].clean_text == "Keep this first line.\nAnd keep this second line."
    assert out[1].n_lines_kept == 2 and out[1].n_lines_dropped == 1
    assert 2 not in out  # min_lines=1 drops the all-filtered doc


def test_gopher_quality_gates(spark):
    ok = (
        "the quick brown foxes jumped over and over with plenty of "
        "meaningful words that keep the detector satisfied today " * 3
    )
    docs = _docs(
        spark,
        [
            (1, ok),  # keep
            (2, "too few words here"),  # too_few_words
            (3, "a " * 60),  # mean_word_len_low (all 1-char)
            (4, ("supercalifragilistic " * 60)),  # mean_word_len_high? len 20 > 10
            (5, ("word " * 30 + "### ... ### ... " * 10)),
            (6, " ".join(str(1000 + i) for i in range(60))),  # alpha_frac 0
            (7, ""),  # degenerate: empty
        ],
    )
    got = {r.doc_id: r for r in W.gopher_quality(docs, min_words=30).collect()}
    assert got[1].keep and got[1].reason is None
    assert got[2].reason == "too_few_words"
    assert got[3].reason == "mean_word_len_low"
    assert got[4].reason == "mean_word_len_high"
    assert got[5].reason == "symbol_ratio"
    assert got[6].reason == "alpha_frac"
    assert got[7].reason == "too_few_words" and got[7].n_words == 0
    # stop-word gate: long, alpha, right word length, but no stop words
    salad = " ".join(["table", "window", "batch", "query"] * 20)
    r = W.gopher_quality(_docs(spark, [(8, salad)]), min_words=30).collect()[0]
    assert r.reason == "stop_words" and r.stop_hits == 0


def test_cap_per_source(spark):
    rows = [(i, f"s{i % 2}", 100 - i) for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = W.cap_per_source(docs, n=3)
    got = {(r.source, r.rank): r.doc_id for r in out.collect()}
    # n_chars DESC == doc_id ASC per source
    assert got == {
        ("s0", 1): 0, ("s0", 2): 2, ("s0", 3): 4,
        ("s1", 1): 1, ("s1", 2): 3, ("s1", 3): 5,
    }


def test_ccnet_buckets_tercile_sizes_and_order(spark):
    # 9 docs in one lang: doc i repeats a common token plus i rare ones,
    # so CE rises with i -> head = lowest-CE third.
    rows = [
        (i, " ".join(["common"] * 12 + [f"rare{i}_{j}" for j in range(i)]), "en")
        for i in range(9)
    ] + [(100, "", "en"), (101, "solo token", "fr")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = W.ccnet_ppl_buckets(docs).collect()
    en = {r.doc_id: r for r in out if r.lang == "en"}
    fr = [r for r in out if r.lang == "fr"]
    assert 100 not in en  # empty doc dropped
    assert len(en) == 9 and len(fr) == 1
    buckets = [en[i].ppl_bucket for i in range(9)]
    assert buckets == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    assert fr[0].ppl_bucket == "head"  # n=1: single doc lands in tile 1
    ces = [en[i].cross_entropy for i in range(9)]
    assert ces == sorted(ces)


def test_ccnet_closed_form_matches_spark_ntile(spark):
    # The closed-form tile formula must agree with Spark's own ntile(3)
    # on an awkward n (not divisible by 3) across two languages.
    rows = [
        (i, f"w{i % 13} w{i % 7} w{i % 3}", "en" if i % 2 else "de")
        for i in range(23)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = W.ccnet_ppl_buckets(docs)
    from pyspark.sql import Window, functions as F
    w = Window.partitionBy("lang").orderBy("cross_entropy", "doc_id")
    chk = out.withColumn("tile", F.ntile(3).over(w)).collect()
    lab = {1: "head", 2: "middle", 3: "tail"}
    assert all(r.ppl_bucket == lab[r.tile] for r in chk)


def test_ccnet_parallelism_invariant(spark):
    rows = [
        (i, f"a{i % 11} b{i % 5} c", "en" if i % 3 else "es") for i in range(60)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    outs = [
        sorted(W.ccnet_ppl_buckets(docs.repartition(p)).collect())
        for p in (1, 4, 17)
    ]
    assert outs[0] == outs[1] == outs[2]
