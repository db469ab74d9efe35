#!/usr/bin/env python
"""Entry point B at open-vocabulary scale (r6 verdict item 6).

Corpus: datagen.open_pages — pseudo-English over a ~10k-form lexicon the
micro-model trainers never saw (NOT the salad grammar, NOT the gen_pages
fixture grammar), >= 100k words at the default 900 docs.

Path exercised (the reference's cube(document) UD entry point,
SURVEY §3): entry A annotates raw text (fused_words) = GOLD ->
io/conllu.serialize_words_grouped -> one .conllu file per document on
disk -> io/conllu.read_conllu scan -> operators/annotate.reannotate
(caller tokenization kept, tagging/parsing/lemmas redone) = SYSTEM ->
operators/evaluate.evaluate = all 13 conll18 metrics, plus
kernels/learned.vocab_coverage over the corpus's distinct keys (the
honest open-vocab gap meter from the r6 verdict).

Since reannotate is deterministic given the gold tokenization, every
metric SHOULD be 1.0 — the run certifies the serialize/scan/reannotate
round trip at open-vocab scale; any drop is a real defect in the UD
path.  vocab_coverage is the non-trivial number: it reports how much of
this corpus rides the shape-generalization path and how well the
learned/transducer kernels agree with the rules oracle there.

Prints one JSON line; numbers are committed to COVERAGE.md with a floor
test in tests/test_open_vocab_eval.py.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nlp_cube_spark.datagen import open_pages  # noqa: E402
from nlp_cube_spark.io import conllu as CU  # noqa: E402
from nlp_cube_spark.kernels import learned  # noqa: E402
from nlp_cube_spark.operators import annotate as A, evaluate as EV  # noqa: E402
from nlp_cube_spark.session import get_spark  # noqa: E402


def run(spark, n_docs: int = 900, seed: int = 4242) -> dict:
    docs = spark.createDataFrame(
        open_pages(n_docs, seed), "url string, text string, lang string"
    )
    gold = A.attach_lemmas(A.fused_words(docs)).localCheckpoint()
    n_words = gold.count()

    # one .conllu file per document, named by the doc index so the two
    # sides join on a shared url key after basename normalization
    out_dir = tempfile.mkdtemp(prefix="openvocab_conllu_")
    for r in CU.serialize_words_grouped(gold).collect():
        i = r.url.rsplit("/", 1)[1]
        with open(os.path.join(out_dir, f"{i}.conllu"), "w") as f:
            f.write(r.conllu)

    key = F.concat(F.regexp_extract("url", r"([0-9]+)(\.conllu)?$", 1), F.lit(".conllu"))
    gold_k = gold.withColumn("url", key)
    system = A.reannotate(
        CU.read_conllu(spark, os.path.join(out_dir, "*.conllu"), lang="en")
        .withColumn("url", key)
    )
    metrics = EV.evaluate(system, gold_k)

    keys = [
        (r.form, r.upos, r.lang)
        for r in gold.select("form", "upos", "lang").dropDuplicates().collect()
    ]
    # trainer key sets so *_exact_frac reports how much of this corpus is
    # genuinely outside the micro-model training vocab (the OOV meter)
    import importlib.util
    import pathlib

    def load_script(name):
        p = pathlib.Path(__file__).parent / f"{name}.py"
        spec = importlib.util.spec_from_file_location(name, p)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    tl = load_script("train_micro_lemmatizer")
    tm = load_script("train_micro_mwt")
    lemma_train = set(tl.lemma_keys(400, 7)) | set(tl.salad_keys())
    mwt_train = {(lang, surface.lower()) for lang, surface, _ in tm.TRAIN_PAIRS}
    cov = learned.vocab_coverage(keys, lemma_train, mwt_train)
    return {
        "n_docs": n_docs,
        "n_words": n_words,
        "n_distinct_keys": cov["n_keys"],
        "metrics_f1": {m: round(v["f1"], 6) for m, v in metrics.items()},
        "vocab_coverage": {
            k: (round(v, 6) if isinstance(v, float) else v) for k, v in cov.items()
        },
    }


def main() -> int:
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        app_name="open-vocab-eval",
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(run(spark)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
