"""CoNLL-2018 shared-task evaluation as distributed DataFrame operators.

Reimplements the semantics of the reference's correctness oracle
(cube/misc/conll18_ud_eval.py) Spark-first:

- the evaluation coordinate system is the characters-without-spaces stream
  (conll18_ud_eval.py:125-275): every surface token occupies a span
  [start, end) in that stream; words inside an MWT share the token's span;
- Tokens / Sentences F1 = span-set intersection via inner join on
  (url, start, end) — the distributed form of the evaluator's two-pointer
  match (:308-320);
- word alignment (:348-473): OUTSIDE multiword regions, words align 1:1 by
  identical spans (a distributed inner join — spans are unique per side
  there). INSIDE multiword regions — maximal intervals covered by
  transitively-overlapping MWT token spans from either side — words align
  by the reference's LCS over lower-cased forms (:401-446), computed per
  region with applyInPandas (regions are sentence-bounded and rare: the
  legitimate small-group imperative case);
- UAS/LAS and friends use the ALIGNMENT MAP exactly like the reference's
  `ga` function (:338-346): a system word's head is correct iff the gold
  word aligned to its system parent IS the gold parent (root -> root);
- CLAS/MLAS/BLEX (:506-517): content-deprel filtering on each side's own
  words, MLAS additionally compares the ordered functional-children lists
  mapped through the alignment, BLEX uses the gold-lemma-gated lemma key;
- DEPREL subtypes after ':' are stripped and FEATS filtered to the
  universal set before any comparison (:157-161).

Everything except the tiny per-region LCS is joins + aggregates; all 13
metric counters come from ONE aggregate over the aligned-pairs table.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

UNIVERSAL_FEATURES = [
    "PronType", "NumType", "Poss", "Reflex", "Foreign", "Abbr", "Gender",
    "Animacy", "Number", "Case", "Definite", "Degree", "VerbForm", "Mood",
    "Tense", "Aspect", "Voice", "Evident", "Polarity", "Person", "Polite",
]

# conll18_ud_eval.py:103-112
CONTENT_DEPRELS = [
    "nsubj", "obj", "iobj", "csubj", "ccomp", "xcomp", "obl", "vocative",
    "expl", "dislocated", "advcl", "advmod", "discourse", "nmod", "appos",
    "nummod", "acl", "amod", "conj", "fixed", "flat", "compound", "list",
    "parataxis", "orphan", "goeswith", "reparandum", "root", "dep",
]
FUNCTIONAL_DEPRELS = ["aux", "cop", "mark", "det", "clf", "case", "cc"]


def with_char_spans(words: DataFrame) -> DataFrame:
    """Add [start, end) spans in the chars-without-spaces stream.

    Surface tokens are the unit: the first word of an MWT carries the
    token text (tok_form), later MWT words add no characters; all words of
    the MWT share the token span (conll18_ud_eval.py word spans)."""
    w = Window.partitionBy("url").orderBy("sent_id", "word_id")
    first_of_tok = (F.col("mwt_id") == 0) | (
        F.lag("mwt_id").over(w).isNull()
        | (F.lag("mwt_id").over(w) != F.col("mwt_id"))
        | (F.lag("sent_id").over(w) != F.col("sent_id"))
    )
    tok_len = F.when(first_of_tok, F.length(F.regexp_replace(F.col("tok_form"), " ", ""))).otherwise(F.lit(0))
    df = words.withColumn("_len", tok_len)
    end = F.sum("_len").over(w.rowsBetween(Window.unboundedPreceding, 0))
    df = df.withColumn("_tok_end", end)
    # span of the word = span of its surface token
    tok_w = Window.partitionBy("url", "sent_id", "mwt_id")
    start = F.when(F.col("mwt_id") > 0, F.min(F.col("_tok_end") - F.col("_len")).over(tok_w)).otherwise(
        F.col("_tok_end") - F.col("_len")
    )
    stop = F.when(F.col("mwt_id") > 0, F.max("_tok_end").over(tok_w)).otherwise(F.col("_tok_end"))
    return df.withColumn("start", start).withColumn("end", stop).drop("_len", "_tok_end")


def _score(correct: int, n_sys: int, n_gold: int) -> dict:
    c = correct
    p = c / n_sys if n_sys else 0.0
    r = c / n_gold if n_gold else 0.0
    f = 2 * c / (n_sys + n_gold) if (n_sys + n_gold) else 0.0
    return {"precision": p, "recall": r, "f1": f}


def token_spans(words: DataFrame) -> DataFrame:
    """One row per surface token: (url, start, end)."""
    return (
        with_char_spans(words)
        .groupBy("url", "sent_id", "mwt_id", "start", "end")
        .agg(F.min("word_id").alias("_w"))
        .select("url", "start", "end")
    )


def sentence_spans(words: DataFrame) -> DataFrame:
    return (
        with_char_spans(words)
        .groupBy("url", "sent_id")
        .agg(F.min("start").alias("start"), F.max("end").alias("end"))
        .select("url", "start", "end")
    )


def span_f1(system: DataFrame, gold: DataFrame, spans) -> dict:
    s = spans(system)
    g = spans(gold)
    correct = s.join(g, ["url", "start", "end"], "inner")
    return _score(correct.count(), s.count(), g.count())


def _norm_feats(col):
    """Keep only universal features, sorted (conll18_ud_eval.py:157-159)."""
    feats = F.when(col == "_", F.array().cast("array<string>")).otherwise(F.split(col, "\\|"))
    univ = F.array([F.lit(u) for u in UNIVERSAL_FEATURES])
    kept = F.filter(feats, lambda x: F.array_contains(univ, F.split(x, "=").getItem(0)))
    return F.array_join(F.array_sort(kept), "|")


def _prep(df: DataFrame) -> DataFrame:
    """Spans + normalized attributes, reference load_conllu semantics."""
    d = with_char_spans(df)
    deprel = F.regexp_replace(F.col("deprel"), ":.*$", "")
    return d.select(
        "url", "sent_id", "word_id",
        (F.col("mwt_id") > 0).alias("is_mwt"),
        "start", "end", "form",
        F.lower("form").alias("form_lower"),
        "lemma", "upos", "xpos",
        _norm_feats(F.col("feats")).alias("feats"),
        "head",
        deprel.alias("deprel"),
        deprel.isin(CONTENT_DEPRELS).alias("is_content"),
        deprel.isin(FUNCTIONAL_DEPRELS).alias("is_functional"),
    )


def _mwt_regions(s: DataFrame, g: DataFrame) -> DataFrame:
    """Maximal multiword regions: merge transitively-overlapping MWT token
    spans from BOTH sides (reference find_multiword_span :368-399 — a new
    MWT extends the region iff it starts strictly before the current end).
    Returns (url, r_start, r_end); regions within a url are disjoint."""
    spans = (
        s.where("is_mwt").select("url", "start", "end")
        .unionByName(g.where("is_mwt").select("url", "start", "end"))
        .dropDuplicates()
    )
    w = Window.partitionBy("url").orderBy("start", "end")
    run_end = F.max("end").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = spans.withColumn(
        "_new", F.when(run_end.isNull() | (F.col("start") >= run_end), 1).otherwise(0)
    )
    rid = F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        flagged.withColumn("_rid", rid)
        .groupBy("url", "_rid")
        .agg(F.min("start").alias("r_start"), F.max("end").alias("r_end"))
        .select("url", "r_start", "r_end")
    )


def _with_region(words: DataFrame, regions: DataFrame) -> DataFrame:
    """Tag each word with the region that consumes it (or null).

    Containment per the reference's pointer walk: an MWT word belongs to
    the region its span starts in; a plain word is consumed iff it lies
    fully inside [r_start, r_end] (a word ending past r_end is 'beyond
    end' and falls back to span alignment)."""
    r = regions.select(
        F.col("url").alias("_rurl"), "r_start", "r_end"
    )
    cond = (words["url"] == r["_rurl"]) & F.when(
        words["is_mwt"],
        (words["start"] >= r["r_start"]) & (words["start"] < r["r_end"]),
    ).otherwise((words["start"] >= r["r_start"]) & (words["end"] <= r["r_end"]))
    return words.join(r, cond, "left").drop("_rurl")


_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("s_sent_id", T.IntegerType()),
        T.StructField("s_word_id", T.IntegerType()),
        T.StructField("g_sent_id", T.IntegerType()),
        T.StructField("g_word_id", T.IntegerType()),
    ]
)


def _lcs_pairs(gold_rows: list, sys_rows: list) -> list:
    """Reference compute_lcs + backtrace (:401-446): longest common
    subsequence over lower-cased forms, preferring the gold pointer on
    ties. rows = (sent_id, word_id, form_lower) in document order."""
    G, S = len(gold_rows), len(sys_rows)
    if G == 0 or S == 0:
        return []
    lcs = [[0] * S for _ in range(G)]
    for g in reversed(range(G)):
        for s in reversed(range(S)):
            if gold_rows[g][2] == sys_rows[s][2]:
                lcs[g][s] = 1 + (lcs[g + 1][s + 1] if g + 1 < G and s + 1 < S else 0)
            lcs[g][s] = max(lcs[g][s], lcs[g + 1][s] if g + 1 < G else 0)
            lcs[g][s] = max(lcs[g][s], lcs[g][s + 1] if s + 1 < S else 0)
    pairs, g, s = [], 0, 0
    while g < G and s < S:
        if gold_rows[g][2] == sys_rows[s][2]:
            pairs.append((gold_rows[g], sys_rows[s]))
            g += 1
            s += 1
        elif lcs[g][s] == (lcs[g + 1][s] if g + 1 < G else 0):
            g += 1
        else:
            s += 1
    return pairs


def _region_aligned_pairs(s_reg: DataFrame, g_reg: DataFrame) -> DataFrame:
    """LCS alignment inside each multiword region (applyInPandas per
    (url, r_start) — regions are tiny and sentence-bounded)."""
    cols = ["url", "r_start", "sent_id", "word_id", "start", "form_lower"]
    tagged = (
        s_reg.select(*cols, F.lit("s").alias("side"))
        .unionByName(g_reg.select(*cols, F.lit("g").alias("side")))
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["start", "sent_id", "word_id"])
        gold = [tuple(x) for x in pdf[pdf["side"] == "g"][["sent_id", "word_id", "form_lower"]].itertuples(index=False)]
        sys_ = [tuple(x) for x in pdf[pdf["side"] == "s"][["sent_id", "word_id", "form_lower"]].itertuples(index=False)]
        url = pdf["url"].iloc[0]
        pairs = _lcs_pairs(gold, sys_)
        return pd.DataFrame(
            [
                {"url": url, "s_sent_id": sw[0], "s_word_id": sw[1],
                 "g_sent_id": gw[0], "g_word_id": gw[1]}
                for gw, sw in pairs
            ],
            columns=[f.name for f in _PAIR_SCHEMA.fields],
        )

    return tagged.groupBy("url", "r_start").applyInPandas(run, schema=_PAIR_SCHEMA)


def alignment_map(system: DataFrame, gold: DataFrame) -> DataFrame:
    """(url, s_sent_id, s_word_id, g_sent_id, g_word_id) aligned pairs.

    system/gold are raw words DataFrames (WORDS_SCHEMA)."""
    s = _prep(system)
    g = _prep(gold)
    regions = _mwt_regions(s, g)
    s_r = _with_region(s, regions)
    g_r = _with_region(g, regions)

    out_s = s_r.where(F.col("r_start").isNull()).select(
        "url", "start", "end",
        F.col("sent_id").alias("s_sent_id"), F.col("word_id").alias("s_word_id"),
    )
    out_g = g_r.where(F.col("r_start").isNull()).select(
        "url", "start", "end",
        F.col("sent_id").alias("g_sent_id"), F.col("word_id").alias("g_word_id"),
    )
    flat = out_s.join(out_g, ["url", "start", "end"], "inner").select(
        "url", "s_sent_id", "s_word_id", "g_sent_id", "g_word_id"
    )
    in_s = s_r.where(F.col("r_start").isNotNull())
    in_g = g_r.where(F.col("r_start").isNotNull())
    return flat.unionByName(_region_aligned_pairs(in_s, in_g))


def aligned_words(system: DataFrame, gold: DataFrame) -> DataFrame:
    """Aligned pairs enriched with both sides' attributes (s_/g_ prefixes)."""
    amap = alignment_map(system, gold)

    def attrs(df, px):
        return _prep(df).select(
            "url",
            F.col("sent_id").alias(f"{px}sent_id"),
            F.col("word_id").alias(f"{px}word_id"),
            F.col("form").alias(f"{px}form"),
            F.col("lemma").alias(f"{px}lemma"),
            F.col("upos").alias(f"{px}upos"),
            F.col("xpos").alias(f"{px}xpos"),
            F.col("feats").alias(f"{px}feats"),
            F.col("head").alias(f"{px}head"),
            F.col("deprel").alias(f"{px}deprel"),
            F.col("is_content").alias(f"{px}is_content"),
        )

    return (
        amap.join(attrs(system, "s_"), ["url", "s_sent_id", "s_word_id"])
        .join(attrs(gold, "g_"), ["url", "g_sent_id", "g_word_id"])
    )


_CHILD_T = "array<struct<cid:string,deprel:string,upos:string,feats:string>>"


def _functional_children(prepped: DataFrame, amap: DataFrame | None, px: str) -> DataFrame:
    """Ordered functional-children list per parent word (reference MLAS
    key component :513-515). For the system side (amap given) each child
    id is mapped through the alignment — unaligned children become 'NA',
    which can never equal a gold child id, exactly like the reference's
    'NotAligned' sentinel."""
    ch = prepped.where(F.col("is_functional") & (F.col("head") > 0))
    if amap is not None:
        m = amap.select(
            "url",
            F.col("s_sent_id").alias("sent_id"),
            F.col("s_word_id").alias("word_id"),
            F.concat_ws(":", "g_sent_id", "g_word_id").alias("_cid"),
        )
        ch = ch.join(m, ["url", "sent_id", "word_id"], "left").withColumn(
            "cid", F.coalesce("_cid", F.lit("NA"))
        )
    else:
        ch = ch.withColumn("cid", F.concat_ws(":", "sent_id", "word_id"))
    return (
        ch.groupBy("url", F.col("sent_id").alias(f"{px}sent_id"), F.col("head").alias(f"{px}word_id"))
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("word_id", "cid", "deprel", "upos", "feats"))),
                lambda x: F.struct(
                    x["cid"].alias("cid"), x["deprel"].alias("deprel"),
                    x["upos"].alias("upos"), x["feats"].alias("feats"),
                ),
            ).alias(f"{px}children")
        )
    )


def _stream_hashes(words: DataFrame) -> DataFrame:
    """md5 of the per-url chars-without-spaces token stream."""
    return (
        with_char_spans(words)
        .groupBy("url", "sent_id", "mwt_id", "start")
        .agg(F.first(F.regexp_replace("tok_form", " ", "")).alias("_t"))
        .groupBy("url")
        .agg(
            F.md5(
                F.concat_ws(
                    "",
                    F.expr("transform(array_sort(collect_list(struct(start, _t))), x -> x._t)"),
                )
            ).alias("_h")
        )
    )


def check_same_characters(system: DataFrame, gold: DataFrame) -> None:
    """Reference guard (conll18_ud_eval.py:449-460): the two sides must
    tokenize the SAME underlying character stream; raise otherwise."""
    s = _stream_hashes(system).select("url", F.col("_h").alias("_hs"))
    g = _stream_hashes(gold).select("url", F.col("_h").alias("_hg"))
    bad = (
        s.join(g, "url", "full")
        .where(
            F.col("_hs").isNull() | F.col("_hg").isNull() | (F.col("_hs") != F.col("_hg"))
        )
        .limit(1)
        .collect()
    )
    if bad:
        raise ValueError(
            f"The concatenation of tokens in gold and system differ (url={bad[0]['url']})"
        )


def evaluate(system: DataFrame, gold: DataFrame) -> dict:
    """All 13 conll18 metrics (incl. CLAS/MLAS/BLEX), one aggregate pass
    over the aligned-pairs table + one over each side's words."""
    system = system.localCheckpoint()
    gold = gold.localCheckpoint()
    check_same_characters(system, gold)
    s_prep = _prep(system).localCheckpoint()
    g_prep = _prep(gold).localCheckpoint()

    s_tot = s_prep.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("is_content").cast("long")).alias("nc")
    ).collect()[0]
    g_tot = g_prep.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("is_content").cast("long")).alias("nc")
    ).collect()[0]

    al = aligned_words(system, gold).localCheckpoint()
    amap = al.select("url", "s_sent_id", "s_word_id", "g_sent_id", "g_word_id")

    # gold word aligned to the SYSTEM parent (reference ga(w.parent))
    parent_map = amap.select(
        "url",
        F.col("s_sent_id").alias("_ps"),
        F.col("s_word_id").alias("_pw"),
        F.col("g_sent_id").alias("gp_sent_id"),
        F.col("g_word_id").alias("gp_word_id"),
    )
    al = al.join(
        parent_map,
        (al["url"] == parent_map["url"]) & (al["s_sent_id"] == parent_map["_ps"]) & (al["s_head"] == parent_map["_pw"]),
        "left",
    ).drop(parent_map["url"]).drop("_ps", "_pw")

    empty = F.array().cast(_CHILD_T)
    g_ch = _functional_children(g_prep, None, "g_")
    s_ch = _functional_children(s_prep, amap, "s_")
    al = (
        al.join(g_ch, ["url", "g_sent_id", "g_word_id"], "left")
        .join(s_ch, ["url", "s_sent_id", "s_word_id"], "left")
        .withColumn("g_children", F.coalesce("g_children", empty))
        .withColumn("s_children", F.coalesce("s_children", empty))
    )

    head_ok = ((F.col("s_head") == 0) & (F.col("g_head") == 0)) | (
        (F.col("s_head") != 0) & (F.col("g_head") != 0)
        & (F.col("gp_sent_id") == F.col("g_sent_id"))
        & (F.col("gp_word_id") == F.col("g_head"))
    )
    upos_ok = F.col("s_upos") == F.col("g_upos")
    xpos_ok = F.col("s_xpos") == F.col("g_xpos")
    feats_ok = F.col("s_feats") == F.col("g_feats")
    deprel_ok = F.col("s_deprel") == F.col("g_deprel")
    # reference Lemmas key (:505): gold '_' lemma gates both sides to '_'
    lemma_ok = (F.col("g_lemma") == "_") | (F.col("s_lemma") == F.col("g_lemma"))
    las_ok = head_ok & deprel_ok
    children_ok = F.col("s_children") == F.col("g_children")
    gc = F.col("g_is_content")

    def s(cond, name):
        # sum over an EMPTY aligned table is NULL, not 0 (zero-overlap case)
        return F.coalesce(F.sum(cond.cast("long")), F.lit(0)).alias(name)

    counts = al.agg(
        F.count(F.lit(1)).alias("aligned"),
        s(upos_ok, "UPOS"),
        s(xpos_ok, "XPOS"),
        s(feats_ok, "UFeats"),
        s(upos_ok & xpos_ok & feats_ok, "AllTags"),
        s(lemma_ok, "Lemmas"),
        s(head_ok, "UAS"),
        s(las_ok, "LAS"),
        s(gc & las_ok, "CLAS"),
        s(gc & las_ok & upos_ok & feats_ok & children_ok, "MLAS"),
        s(gc & las_ok & lemma_ok, "BLEX"),
    ).collect()[0]

    out = {
        "Tokens": span_f1(system, gold, token_spans),
        "Sentences": span_f1(system, gold, sentence_spans),
        "Words": _score(counts["aligned"], s_tot["n"], g_tot["n"]),
    }
    for m in ("UPOS", "XPOS", "UFeats", "AllTags", "Lemmas", "UAS", "LAS"):
        out[m] = _score(counts[m], s_tot["n"], g_tot["n"])
    for m in ("CLAS", "MLAS", "BLEX"):
        out[m] = _score(counts[m], s_tot["nc"] or 0, g_tot["nc"] or 0)
    return out
