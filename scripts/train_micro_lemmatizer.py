#!/usr/bin/env python
"""Train the pinned-weight micro-lemmatizer (kernels/learned.py).

Same regime as train_micro_taggers.py: deterministic multiclass perceptron
on rule-kernel gold, exact-parity gate on a held-out seed. The training
table is the DISTINCT (form, upos, lang) keys of the annotated fixture
corpus — exactly the dedup key of the Spark lemma stage
(operators/annotate.attach_lemmas) and of the reference's training dedup
(cube/networks/utils.py:109-115) — with the class being the form->lemma
edit script (strip|append|case), the classification reduction of the
reference's char seq2seq (lemmatizer.py:78-171).

    python scripts/train_micro_lemmatizer.py [--docs 400] [--seed 7]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nlp_cube_spark.datagen import gen_pages
from nlp_cube_spark.kernels import learned, lemma_rules
from nlp_cube_spark.operators.annotate import _annotate_doc

KERNELS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "nlp_cube_spark", "kernels"
)


def lemma_keys(n_docs: int, seed: int) -> list[tuple[str, str, str]]:
    """Distinct (form, upos, lang) over annotated fixture pages, in first-
    sight corpus order (deterministic)."""
    seen: dict[tuple[str, str, str], None] = {}
    for page in gen_pages(n_docs, seed=seed):
        for forms, _sp, _mw, _tf, tags, _hd, _lb in _annotate_doc(page["text"], page["lang"]):
            for form, (u, _x, _f) in zip(forms, tags):
                seen.setdefault((form, u, page["lang"]))
    return list(seen)


# The closed word-salad vocabulary of the testdata documents table
# (TESTDATA.md); lemma keys are (form, upos, lang), so enumerating every
# form x possible-rule-tag x lang is EXHAUSTIVE for that corpus.
SALAD_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]


def salad_keys() -> list[tuple[str, str, str]]:
    from nlp_cube_spark.kernels import tagger_rules

    zh_chars = sorted({c for w in SALAD_VOCAB for c in w})
    seen: dict[tuple[str, str, str], None] = {}
    for lang in ("en", "de", "es", "fr", "zh"):
        for form in zh_chars if lang == "zh" else SALAD_VOCAB:
            for first in (True, False):
                u, _x, _f = tagger_rules.tag_word(form, lang, first)
                seen.setdefault((form, u, lang))
    return list(seen)


# Open-vocabulary generalization battery (r5): the r5 coverage test
# measured 95.5% rules-agreement on genuinely unseen English web text;
# the misses were (a) PROPN recasing — too few PROPN train keys, so
# unseen PROPN forms predicted the lowercase identity class — and (b)
# '-ss' endings mis-striping the plural-s rule. These keys teach those
# SHAPES (gold still derives from lemma_rules at example time, like
# every other key); the w:/wu:/wul: exact-key features keep the train
# set separable, while u:/suf{k}:{suf}:{upos} carry the transfer.
def generalization_keys() -> list[tuple[str, str, str]]:
    propn = ["Paris", "London", "Berlin", "Lisbon", "Dublin", "Athens",
             "Wales", "Hastings", "Flanders", "Andes", "Naples", "Santos",
             "Reading", "Banning", "Salford", "Oxford"]
    ss_forms = ["class", "press", "process", "address", "access", "loss",
                "cross", "pass", "glass", "mass", "chess", "stress"]
    # NOTE: deliberately DISJOINT from tests/test_learned_kernel.OPEN_SENTS
    # content words — the battery teaches suffix SHAPES, while the open-
    # vocabulary coverage eval stays genuinely out-of-vocabulary.
    ing_ed = ["building", "testing", "fixing", "loading", "mapping",
              "braked", "marked", "mapped", "folded", "shipped"]
    ies = ["copies", "ferries", "bodies", "stories", "parties"]
    plurals = ["signals", "brokers", "reports", "drivers", "widgets",
               "panels", "engines", "funnels", "ledgers", "optics",
               # -es / -ps suffix shapes (r5 coverage misses: 'stages'
               # rode the -ies strip-3 class, 'loops' the identity class)
               "badges", "nodes", "caches", "images", "ranges", "phrases",
               "maps", "groups", "chips", "steps", "scoops", "heaps"]
    advs = ["briskly", "slowly", "swiftly", "gladly", "rarely"]
    keys: list[tuple[str, str, str]] = []
    for f in propn:
        keys.append((f, "PROPN", "en"))
    for f in ss_forms:
        keys += [(f, "NOUN", "en"), (f, "VERB", "en")]
        keys.append((f.capitalize(), "NOUN", "en"))  # sentence-initial
    for f in ing_ed:
        keys += [(f, "VERB", "en"), (f.capitalize(), "VERB", "en")]
    for f in ies:
        keys += [(f, "NOUN", "en"), (f, "VERB", "en")]
    for f in plurals:
        keys += [(f, "NOUN", "en"), (f.capitalize(), "NOUN", "en"),
                 (f, "PROPN", "en")]
    for f in advs:
        keys.append((f, "ADV", "en"))
    # a light multilingual sprinkle so the en battery doesn't skew the
    # shared u:/suf features for other corpus languages
    for lang in ("de", "es", "fr"):
        keys += [("Hamburg", "PROPN", lang), ("libros", "NOUN", lang),
                 ("klasse", "NOUN", lang)]
    return keys


def examples(keys):
    out = []
    for form, upos, lang in keys:
        gold_lemma = lemma_rules.lemmatize(form, upos, lang)
        cls = learned.edit_script(form, gold_lemma)
        assert learned.apply_edit(form, cls) == gold_lemma, (form, upos, lang, cls, gold_lemma)
        out.append((learned.lemma_features(form, upos, lang), cls))
    return out


def train(exs, epochs: int = 30) -> dict:
    classes = sorted({c for _, c in exs})
    w: dict[str, dict[str, float]] = defaultdict(lambda: defaultdict(float))
    weights = {"classes": classes, "w": w}
    for ep in range(epochs):
        errors = 0
        for feats, gold in exs:
            pred = learned.perceptron_predict(weights, feats)
            if pred != gold:
                errors += 1
                for f in feats:
                    w[f][gold] = w[f].get(gold, 0.0) + 1.0
                    w[f][pred] = w[f].get(pred, 0.0) - 1.0
        print(f"  epoch {ep}: {errors} errors / {len(exs)}")
        if errors == 0:
            break
    return {
        "classes": classes,
        "w": {
            f: {c: round(v, 6) for c, v in sorted(cw.items()) if v != 0.0}
            for f, cw in sorted(w.items())
            if any(v != 0.0 for v in cw.values())
        },
    }


def lemma_accuracy(weights, keys) -> tuple[int, int]:
    """End-to-end parity: predicted edit script APPLIED must equal the gold
    lemma (a different script producing the same string still counts)."""
    wrong = 0
    for form, upos, lang in keys:
        gold = lemma_rules.lemmatize(form, upos, lang)
        cls = learned.perceptron_predict(weights, learned.lemma_features(form, upos, lang))
        if learned.apply_edit(form, cls) != gold:
            wrong += 1
    return wrong, len(keys)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=400)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--holdout-seed", type=int, default=909)
    args = ap.parse_args()

    print("training micro_lemmatizer")
    train_keys = lemma_keys(args.docs, args.seed)
    sal = salad_keys()
    gen = generalization_keys()
    dedup = {k: None for k in train_keys + sal + gen}
    train_keys = list(dedup)
    weights = train(examples(train_keys))
    tw, tt = lemma_accuracy(weights, train_keys)
    held_keys = lemma_keys(120, args.holdout_seed)
    hw, ht = lemma_accuracy(weights, held_keys)
    sw, st = lemma_accuracy(weights, sal)
    print(
        f"  train {tt - tw}/{tt}  holdout {ht - hw}/{ht}  salad {st - sw}/{st}"
        f"  classes={len(weights['classes'])}"
    )
    hw += sw  # salad parity folds into the ship gate

    out_path = os.path.join(KERNELS_DIR, "micro_lemmatizer_weights.json")
    with open(out_path, "w") as f:
        json.dump(weights, f, indent=1, sort_keys=True)
    digest = hashlib.sha256(open(out_path, "rb").read()).hexdigest()
    print(f"  wrote {out_path}")
    print(f"  sha256 {digest}  <- update io/modelstore._CATALOG")
    if tw or hw:
        print("  WARNING: imperfect parity — do not ship these weights")
        sys.exit(1)


if __name__ == "__main__":
    main()
