"""Open-IE triple extraction from dependency arcs (SURVEY.md §2c).

Patterns: svo (nsubj + VERB + obj), obl (nsubj + VERB + obl/case),
copula (cop child on a nominal root: README.md:24-31 — "is" is cop, the
nominal is root), appos.

Two physical strategies:

- `extract_triples_nested` (default scale path): Catalyst higher-order
  functions (filter/transform/exists) over the per-sentence `words` array.
  Arc navigation is array indexing inside one row — ZERO shuffle, full
  whole-stage codegen, no Python. The only join is the broadcast of the
  distinct predicate-lemma dimension (Zipf-bounded).

- `extract_triples_join` (relational demo, §2d): equi self-joins of the flat
  words table on (url, sent_id, head = word_id). Same results; costs three
  shuffle joins — kept as the oracle-checkable variant and for engines
  without HOF support.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..kernels import lemma_rules

_TRIPLES_EXPR = """
flatten(array(
  flatten(transform(filter(words, v -> v.upos = 'VERB'), v ->
    flatten(transform(filter(words, s -> s.head = v.word_id AND s.deprel = 'nsubj'), s ->
      concat(
        transform(filter(words, o -> o.head = v.word_id AND o.deprel = 'obj'), o ->
          struct(s.form AS subj, v.form AS pred_form, CAST(NULL AS STRING) AS case_form,
                 o.form AS obj, 'svo' AS pattern)),
        transform(filter(words, o -> o.head = v.word_id AND o.deprel = 'obl'), o ->
          struct(s.form AS subj, v.form AS pred_form,
                 element_at(transform(filter(words, c -> c.head = o.word_id AND c.deprel = 'case'),
                                      c -> c.form), 1) AS case_form,
                 o.form AS obj, 'obl' AS pattern))
      )
    ))
  )),
  flatten(transform(
    filter(words, r -> r.upos IN ('NOUN','PROPN','PRON','NUM')
                   AND exists(words, c -> c.head = r.word_id AND c.deprel = 'cop')),
    r -> transform(filter(words, s -> s.head = r.word_id AND s.deprel = 'nsubj'), s ->
      struct(s.form AS subj, 'be' AS pred_form, CAST(NULL AS STRING) AS case_form,
             r.form AS obj, 'copula' AS pattern)))),
  transform(filter(words, a -> a.deprel = 'appos'), a ->
    struct(element_at(transform(filter(words, h -> h.word_id = a.head), h -> h.form), 1) AS subj,
           'appos' AS pred_form, CAST(NULL AS STRING) AS case_form,
           a.form AS obj, 'appos' AS pattern))
))
"""

_PRED_LEMMA_SCHEMA = T.StructType(
    [
        T.StructField("pred_form", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("pred_lemma", T.StringType()),
    ]
)


def _pred_lemma_dim(raw: DataFrame) -> DataFrame:
    """Distinct verb surface forms -> lemma (broadcast dimension)."""
    keys = (
        raw.where(F.col("pattern").isin("svo", "obl"))
        .select("pred_form", "lang")
        .dropDuplicates()
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["pred_lemma"] = [
                lemma_rules.lemmatize(f, "VERB", lg) for f, lg in zip(pdf["pred_form"], pdf["lang"])
            ]
            yield pdf

    return keys.mapInPandas(run, schema=_PRED_LEMMA_SCHEMA)


def _finalize(raw: DataFrame) -> DataFrame:
    dim = _pred_lemma_dim(raw)
    pred = (
        F.when(F.col("pattern") == "copula", F.lit("be"))
        .when(F.col("pattern") == "appos", F.lit("appos"))
        .otherwise(
            F.concat(
                F.coalesce(F.col("pred_lemma"), F.lower(F.col("pred_form"))),
                F.when(
                    F.col("case_form").isNotNull(), F.concat(F.lit("_"), F.lower(F.col("case_form")))
                ).otherwise(F.lit("")),
            )
        )
    )
    return (
        raw.join(F.broadcast(dim), on=["pred_form", "lang"], how="left")
        .select(
            "url",
            "sent_id",
            "lang",
            F.col("subj"),
            pred.alias("pred"),
            F.col("obj"),
            "pattern",
        )
        .where(F.col("subj").isNotNull() & F.col("obj").isNotNull())
    )


def extract_triples_nested(parsed: DataFrame) -> DataFrame:
    """parsed (url, lang, sent_id, words ARRAY<STRUCT>) -> triples DF."""
    raw = (
        parsed.select(
            "url", "lang", "sent_id", F.explode(F.expr(_TRIPLES_EXPR)).alias("t")
        ).select("url", "lang", "sent_id", "t.*")
    )
    return _finalize(raw)


def extract_triples_join(words: DataFrame) -> DataFrame:
    """Flat words table self-join variant (words already lemmatized).

    Arc navigation = equi joins on (url, sent_id, head=word_id); Catalyst
    plans sort-merge joins, AQE handles skew. Column-pruned inputs keep the
    shuffled payload minimal."""
    w = words.select("url", "lang", "sent_id", "word_id", "form", "lemma", "upos", "deprel", "head")
    verbs = w.where(F.col("upos") == "VERB").select(
        "url", "lang", "sent_id", F.col("word_id").alias("v_id"), F.col("lemma").alias("v_lemma")
    )
    subs = w.where(F.col("deprel") == "nsubj").select(
        "url", "sent_id", F.col("head").alias("v_id"), F.col("form").alias("subj")
    )
    objs = w.where(F.col("deprel") == "obj").select(
        "url", "sent_id", F.col("head").alias("v_id"), F.col("form").alias("obj")
    )
    obls = w.where(F.col("deprel") == "obl").select(
        "url", "sent_id", F.col("head").alias("v_id"), F.col("word_id").alias("o_id"), F.col("form").alias("obj")
    )
    cases = w.where(F.col("deprel") == "case").select(
        "url", "sent_id", F.col("head").alias("o_id"), F.col("form").alias("case_form")
    )

    svo = (
        verbs.join(subs, ["url", "sent_id", "v_id"])
        .join(objs, ["url", "sent_id", "v_id"])
        .select("url", "sent_id", "lang", "subj", F.col("v_lemma").alias("pred"), "obj", F.lit("svo").alias("pattern"))
    )
    obl = (
        verbs.join(subs, ["url", "sent_id", "v_id"])
        .join(obls, ["url", "sent_id", "v_id"])
        .join(cases, ["url", "sent_id", "o_id"], "left")
        .select(
            "url",
            "sent_id",
            "lang",
            "subj",
            F.concat(
                F.col("v_lemma"),
                F.when(F.col("case_form").isNotNull(), F.concat(F.lit("_"), F.lower("case_form"))).otherwise(F.lit("")),
            ).alias("pred"),
            "obj",
            F.lit("obl").alias("pattern"),
        )
    )
    roots = w.where(F.col("upos").isin("NOUN", "PROPN", "PRON", "NUM")).select(
        "url", "lang", "sent_id", F.col("word_id").alias("r_id"), F.col("form").alias("obj")
    )
    cops = w.where(F.col("deprel") == "cop").select("url", "sent_id", F.col("head").alias("r_id")).dropDuplicates()
    csubs = w.where(F.col("deprel") == "nsubj").select(
        "url", "sent_id", F.col("head").alias("r_id"), F.col("form").alias("subj")
    )
    cop = (
        roots.join(cops, ["url", "sent_id", "r_id"])
        .join(csubs, ["url", "sent_id", "r_id"])
        .select("url", "sent_id", "lang", "subj", F.lit("be").alias("pred"), "obj", F.lit("copula").alias("pattern"))
    )
    heads = w.select("url", "sent_id", F.col("word_id").alias("h_id"), F.col("form").alias("subj"))
    appos = (
        w.where(F.col("deprel") == "appos")
        .select("url", "lang", "sent_id", F.col("head").alias("h_id"), F.col("form").alias("obj"))
        .join(heads, ["url", "sent_id", "h_id"])
        .select("url", "sent_id", "lang", "subj", F.lit("appos").alias("pred"), "obj", F.lit("appos").alias("pattern"))
    )
    return svo.unionByName(obl).unionByName(cop).unionByName(appos)
