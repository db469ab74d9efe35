"""CoNLL-2018 shared-task evaluation as distributed DataFrame operators.

Reimplements the semantics of the reference's correctness oracle
(cube/misc/conll18_ud_eval.py) Spark-first:

- the evaluation coordinate system is the characters-without-spaces stream
  (conll18_ud_eval.py:125-275): every surface token occupies a span
  [start, end) in that stream; words inside an MWT share the token's span;
- Tokens / Sentences F1 = span-set intersection via inner join on
  (url, start, end) — the distributed form of the evaluator's two-pointer
  match (:308-320);
- word-level metrics (UPOS/XPOS/UFeats/Lemmas/UAS/LAS) are computed over
  ALIGNED words: words whose spans match 1:1 (the evaluator's alignment
  :348-473; the LCS fallback inside differing MWT regions is not needed
  when MWT expansions are dictionary-deterministic, as here — differing
  regions simply contribute no aligned words, exactly like an LCS miss);
- UAS/LAS: an aligned word scores iff its head maps to the ALIGNED gold
  head (root -> root); DEPREL subtypes after ':' are stripped and FEATS
  are filtered to the universal set before comparison (:157-161);
- P/R/F1 definitions are the evaluator's Score (:279-288).

Everything is joins + window functions; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

UNIVERSAL_FEATURES = [
    "PronType", "NumType", "Poss", "Reflex", "Foreign", "Abbr", "Gender",
    "Animacy", "Number", "Case", "Definite", "Degree", "VerbForm", "Mood",
    "Tense", "Aspect", "Voice", "Evident", "Polarity", "Person", "Polite",
]


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


def _score(correct: DataFrame, n_sys: int, n_gold: int) -> dict:
    c = correct if isinstance(correct, int) else correct.count()
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
    return _score(correct, s.count(), g.count())


def _norm_feats(col):
    """Keep only universal features, sorted (conll18_ud_eval.py:157-159)."""
    feats = F.when(col == "_", F.array().cast("array<string>")).otherwise(F.split(col, "\\|"))
    univ = F.array([F.lit(u) for u in UNIVERSAL_FEATURES])
    kept = F.filter(feats, lambda x: F.array_contains(univ, F.split(x, "=").getItem(0)))
    return F.array_join(F.array_sort(kept), "|")


def aligned_words(system: DataFrame, gold: DataFrame) -> DataFrame:
    """Words aligned by identical (url, start, end) spans, 1:1 only.

    Columns: url, span keys, s_/g_ word attributes incl. the span of each
    side's head word (for UAS/LAS)."""
    def prep(df, px):
        d = with_char_spans(df)
        heads = d.select(
            F.col("url").alias("_hurl"),
            F.col("sent_id").alias("_hsid"),
            F.col("word_id").alias("_hid"),
            F.col("start").alias(f"{px}head_start"),
            F.col("end").alias(f"{px}head_end"),
        )
        d = d.join(
            heads,
            (d["url"] == heads["_hurl"]) & (d["sent_id"] == heads["_hsid"]) & (d["head"] == heads["_hid"]),
            "left",
        ).drop("_hurl", "_hsid", "_hid")
        return d.select(
            "url",
            F.col("sent_id").alias(f"{px}sent_id"),
            F.col("word_id").alias(f"{px}word_id"),
            "start",
            "end",
            F.col("form").alias(f"{px}form"),
            F.col("lemma").alias(f"{px}lemma"),
            F.col("upos").alias(f"{px}upos"),
            F.col("xpos").alias(f"{px}xpos"),
            _norm_feats(F.col("feats")).alias(f"{px}feats"),
            F.col("head").alias(f"{px}head"),
            F.regexp_replace(F.col("deprel"), ":.*$", "").alias(f"{px}deprel"),
            F.coalesce(F.col(f"{px}head_start"), F.lit(-1)).alias(f"{px}head_start"),
            F.coalesce(F.col(f"{px}head_end"), F.lit(-1)).alias(f"{px}head_end"),
        )

    s = prep(system, "s_")
    g = prep(gold, "g_")
    # 1:1 span alignment: spans are unique per side by construction for
    # non-MWT words; MWT words share a span, so pair them by rank within
    # the span (the evaluator's in-region ordering)
    ws = Window.partitionBy("url", "start", "end").orderBy("s_word_id")
    wg = Window.partitionBy("url", "start", "end").orderBy("g_word_id")
    s = s.withColumn("_rk", F.row_number().over(ws))
    g = g.withColumn("_rk", F.row_number().over(wg))
    return s.join(g, ["url", "start", "end", "_rk"], "inner")


def evaluate(system: DataFrame, gold: DataFrame) -> dict:
    """13-metric dict in the shape of conll18_ud_eval_wrapper.conll_eval."""
    system = system.localCheckpoint()
    gold = gold.localCheckpoint()
    n_sys_words = system.count()
    n_gold_words = gold.count()
    al = aligned_words(system, gold).localCheckpoint()
    n_al = al.count()

    out = {
        "Tokens": span_f1(system, gold, token_spans),
        "Sentences": span_f1(system, gold, sentence_spans),
        "Words": _score(n_al, n_sys_words, n_gold_words),
    }

    def aligned_metric(cond, name):
        c = al.where(cond).count()
        out[name] = _score(c, n_sys_words, n_gold_words)

    aligned_metric(F.col("s_upos") == F.col("g_upos"), "UPOS")
    aligned_metric(F.col("s_xpos") == F.col("g_xpos"), "XPOS")
    aligned_metric(F.col("s_feats") == F.col("g_feats"), "UFeats")
    aligned_metric(
        (F.col("s_upos") == F.col("g_upos"))
        & (F.col("s_xpos") == F.col("g_xpos"))
        & (F.col("s_feats") == F.col("g_feats")),
        "AllTags",
    )
    aligned_metric(F.col("s_lemma") == F.col("g_lemma"), "Lemmas")
    head_match = (
        ((F.col("s_head") == 0) & (F.col("g_head") == 0))
        | (
            (F.col("s_head") != 0)
            & (F.col("g_head") != 0)
            & (F.col("s_head_start") == F.col("g_head_start"))
            & (F.col("s_head_end") == F.col("g_head_end"))
        )
    )
    aligned_metric(head_match, "UAS")
    aligned_metric(head_match & (F.col("s_deprel") == F.col("g_deprel")), "LAS")
    return out
