"""Open-IE triple extraction from dependency arcs (SURVEY.md §2c).

Patterns: svo (nsubj + VERB + obj), obl (nsubj + VERB + obl/case),
copula (cop child on a nominal root: README.md:24-31 — "is" is cop, the
nominal is root), appos.

Three physical strategies, all producing identical triples (tested):

- `extract_triples_kernel` (DEFAULT / scale path): arc navigation inside
  the same Arrow stage that holds the parse — zero shuffle, zero Python
  round trips beyond the batch it already owns. `annotate.fused_triples`
  goes further and fuses segment+tag+parse+extract into one stage.

- `extract_triples_nested`: Catalyst higher-order functions
  (filter/transform/exists) over the per-sentence `words` array. Zero
  shuffle and no Python, but Spark evaluates HOF lambdas interpreted (no
  codegen) — measured ~5 JVM-core-ms/doc vs ~0.3 Python-ms for the kernel,
  which is why it is not the default (PLANS.md).

- `extract_triples_join` (relational demo, §2d): equi self-joins of the
  flat words table on (url, sent_id, head = word_id). Costs three shuffle
  joins; kept as the SQL-shaped variant.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..kernels import lemma_rules

# Role arrays (_verbs/_subs/_objs/_obls/_cases/_cops/_appos) are prefiltered
# once per sentence (one pass over `words` each); the pattern assembly below
# then iterates only over those small arrays. HOF expressions are evaluated
# interpreted (no codegen), so avoiding the naive per-verb rescan of `words`
# is a ~10x JVM-CPU saving on long web sentences.
_ROLE_COLS = {
    "_verbs": "filter(words, w -> w.upos = 'VERB')",
    "_subs": "filter(words, w -> w.deprel = 'nsubj')",
    "_objs": "filter(words, w -> w.deprel = 'obj')",
    "_obls": "filter(words, w -> w.deprel = 'obl')",
    "_cases": "filter(words, w -> w.deprel = 'case')",
    "_cops": "filter(words, w -> w.deprel = 'cop')",
    "_appos": "filter(words, w -> w.deprel = 'appos')",
}

_TRIPLES_EXPR = """
flatten(array(
  flatten(transform(_verbs, v ->
    flatten(transform(filter(_subs, s -> s.head = v.word_id), s ->
      concat(
        transform(filter(_objs, o -> o.head = v.word_id), o ->
          struct(s.form AS subj, v.form AS pred_form, CAST(NULL AS STRING) AS case_form,
                 o.form AS obj, 'svo' AS pattern)),
        transform(filter(_obls, o -> o.head = v.word_id), o ->
          struct(s.form AS subj, v.form AS pred_form,
                 element_at(transform(filter(_cases, c -> c.head = o.word_id),
                                      c -> c.form), 1) AS case_form,
                 o.form AS obj, 'obl' AS pattern))
      )
    ))
  )),
  flatten(transform(
    filter(words, r -> r.upos IN ('NOUN','PROPN','PRON','NUM')
                   AND exists(_cops, c -> c.head = r.word_id)),
    r -> transform(filter(_subs, s -> s.head = r.word_id), s ->
      struct(s.form AS subj, 'be' AS pred_form, CAST(NULL AS STRING) AS case_form,
             r.form AS obj, 'copula' AS pattern)))),
  transform(_appos, a ->
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


TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("sent_id", T.IntegerType()),
        T.StructField("lang", T.StringType()),
        T.StructField("subj", T.StringType()),
        T.StructField("pred", T.StringType()),
        T.StructField("obj", T.StringType()),
        T.StructField("pattern", T.StringType()),
    ]
)


def extract_triples_kernel(parsed: DataFrame) -> DataFrame:
    """Arrow-kernel triple extraction (the default scale path).

    Identical output to `extract_triples_nested`, but the arc navigation
    runs inside the same Arrow stage as the parse output instead of as
    interpreted Catalyst lambda evaluation: Spark higher-order functions
    are NOT whole-stage-codegen'd, and we measured ~5 JVM-core-ms per doc
    for the HOF variant vs ~0.3 Python-ms here. Zero shuffle, zero join —
    predicate lemmas are rule calls on the (few) verbs per sentence."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = {k: [] for k in ("url", "sent_id", "lang", "subj", "pred", "obj", "pattern")}

            def emit(url, sid, lang, s, p, o, pat):
                out["url"].append(url)
                out["sent_id"].append(sid)
                out["lang"].append(lang)
                out["subj"].append(s)
                out["pred"].append(p)
                out["obj"].append(o)
                out["pattern"].append(pat)

            for url, sid, lang, words in zip(pdf["url"], pdf["sent_id"], pdf["lang"], pdf["words"]):
                kids: dict[int, list] = {}
                by_id: dict[int, dict] = {}
                for w in words:
                    by_id[w["word_id"]] = w
                    kids.setdefault(w["head"], []).append(w)
                for w in words:
                    deps = kids.get(w["word_id"], [])
                    subs = [d for d in deps if d["deprel"] == "nsubj"]
                    if w["upos"] == "VERB":
                        v_lemma = lemma_rules.lemmatize(w["form"], "VERB", lang)
                        objs = [d for d in deps if d["deprel"] == "obj"]
                        obls = [d for d in deps if d["deprel"] == "obl"]
                        for s in subs:
                            for o in objs:
                                emit(url, sid, lang, s["form"], v_lemma, o["form"], "svo")
                            for o in obls:
                                case = next((c for c in kids.get(o["word_id"], []) if c["deprel"] == "case"), None)
                                pred = f"{v_lemma}_{case['form'].lower()}" if case else v_lemma
                                emit(url, sid, lang, s["form"], pred, o["form"], "obl")
                    if w["upos"] in ("NOUN", "PROPN", "PRON", "NUM") and any(
                        d["deprel"] == "cop" for d in deps
                    ):
                        for s in subs:
                            emit(url, sid, lang, s["form"], "be", w["form"], "copula")
                    for a in (d for d in deps if d["deprel"] == "appos"):
                        emit(url, sid, lang, w["form"], "appos", a["form"], "appos")
            if out["url"]:
                yield pd.DataFrame(out)

    return parsed.select("url", "sent_id", "lang", "words").mapInPandas(run, schema=TRIPLES_SCHEMA)


def extract_triples_nested(parsed: DataFrame) -> DataFrame:
    """parsed (url, lang, sent_id, words ARRAY<STRUCT>) -> triples DF."""
    staged = parsed
    for col, expr in _ROLE_COLS.items():
        staged = staged.withColumn(col, F.expr(expr))
    raw = (
        staged.select(
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
