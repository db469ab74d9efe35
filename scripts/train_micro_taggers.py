#!/usr/bin/env python
"""Train the pinned-weight micro-tagger and micro-boundary-classifier
(kernels/learned.py). Same regime as train_micro_parser.py: deterministic
multiclass perceptron on rule-kernel gold over seeded fixture pages, swept
in corpus order, exact-parity gate on a held-out seed.

    python scripts/train_micro_taggers.py [--docs 400] [--seed 7]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nlp_cube_spark.datagen import gen_pages
from nlp_cube_spark.kernels import learned, segment_rules, tagger_rules
from nlp_cube_spark.kernels.pretokenizer import normalize_ws, pretokenize
from nlp_cube_spark.operators.annotate import _annotate_doc

KERNELS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "nlp_cube_spark", "kernels"
)


def tagger_examples(n_docs: int, seed: int):
    """(feats, gold_class) per word; class = upos\\txpos\\tfeats."""
    out = []
    for page in gen_pages(n_docs, seed=seed):
        for forms, _sp, _mw, _tf, tags, _hd, _lb in _annotate_doc(page["text"], page["lang"]):
            for i, (u, x, f) in enumerate(tags):
                out.append((learned.tag_features(forms, page["lang"], i), f"{u}\t{x}\t{f}"))
    return out


# The closed word-salad vocabulary of the testdata `documents` table
# (TESTDATA.md; 31 lowercase tokens, langs en/de/es/fr space-split, zh
# per-character). tag_features only sees one token of context each side,
# so exhaustive (prev, cur, next, lang) coverage here means ZERO training
# errors == exact rules parity on ANY salad document at ANY scale factor.
SALAD_VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]
SALAD_LANGS = ["en", "de", "es", "fr"]


def salad_tagger_examples():
    out = []
    zh_chars = sorted({c for w in SALAD_VOCAB for c in w})
    for lang, vocab in [(lg, SALAD_VOCAB) for lg in SALAD_LANGS] + [("zh", zh_chars)]:
        for cur in vocab:
            for prev in [None] + vocab:
                for nxt in [None] + vocab:
                    if prev is None:
                        forms, i = ([cur] if nxt is None else [cur, nxt]), 0
                    else:
                        forms, i = ([prev, cur] if nxt is None else [prev, cur, nxt]), 1
                    u, x, f = tagger_rules.tag_word(cur, lang, i == 0)
                    out.append((learned.tag_features(forms, lang, i), f"{u}\t{x}\t{f}"))
    return out


def salad_boundary_examples():
    """Exhaustive salad coverage for the boundary classifier: its features
    beyond +-1 token are digit flags only (constant False on the salad
    vocab), so every feature vector the real documents can produce is
    realized by some single word or word pair run through the REAL
    pretokenizer (incl. the zh char-split spacing patterns)."""
    out = []
    zh_chars = sorted({c for w in SALAD_VOCAB for c in w})
    for lang in SALAD_LANGS + ["zh"]:
        vocab = SALAD_VOCAB  # zh docs are salad WORDS too; chars come from pretokenize
        docs = [w for w in vocab] + [f"{w1} {w2}" for w1 in vocab for w2 in vocab]
        if lang == "zh":
            docs += [c for c in zh_chars] + [f"{c1} {c2}" for c1 in zh_chars for c2 in zh_chars]
        for text in docs:
            norm = normalize_ws(text)
            toks, spa = pretokenize(norm, no_space_lang=segment_rules.is_no_space_lang(lang))
            gold = segment_rules.classify(toks, spa, lang)
            for i, lab in enumerate(gold):
                out.append((learned.boundary_features(toks, spa, lang, i), str(lab)))
    return out


def salad_boundary_parity(weights, sf_dir: str = "/root/testdata/sf0.01") -> tuple[int, int]:
    import duckdb

    wrong = total = 0
    for text, lang in duckdb.sql(
        f"SELECT text, lang FROM '{sf_dir}/documents.parquet'"
    ).fetchall():
        norm = normalize_ws(text)
        toks, spa = pretokenize(norm, no_space_lang=segment_rules.is_no_space_lang(lang))
        gold = segment_rules.classify(toks, spa, lang)
        for i, lab in enumerate(gold):
            pred = learned.perceptron_predict(weights, learned.boundary_features(toks, spa, lang, i))
            total += 1
            if pred != str(lab):
                wrong += 1
    return wrong, total


def salad_docs_parity(weights, sf_dir: str = "/root/testdata/sf0.01") -> tuple[int, int]:
    """Parity of the trained tagger vs the rule kernel over the REAL
    documents table (the driver's corpus), via the same _annotate_doc path
    the engine runs."""
    import duckdb

    wrong = total = 0
    for text, lang in duckdb.sql(
        f"SELECT text, lang FROM '{sf_dir}/documents.parquet'"
    ).fetchall():
        for forms, _sp, _mw, _tf, tags, _hd, _lb in _annotate_doc(text, lang):
            for i, (u, x, f) in enumerate(tags):
                pred = learned.perceptron_predict(weights, learned.tag_features(forms, lang, i))
                total += 1
                if pred != f"{u}\t{x}\t{f}":
                    wrong += 1
    return wrong, total


def boundary_examples(n_docs: int, seed: int):
    out = []
    for page in gen_pages(n_docs, seed=seed):
        norm = normalize_ws(page["text"])
        toks, spa = pretokenize(norm, no_space_lang=segment_rules.is_no_space_lang(page["lang"]))
        gold = segment_rules.classify(toks, spa, page["lang"])
        for i, lab in enumerate(gold):
            out.append((learned.boundary_features(toks, spa, page["lang"], i), str(lab)))
    return out


def train(examples, epochs: int = 25) -> dict:
    classes = sorted({c for _, c in examples})
    w: dict[str, dict[str, float]] = defaultdict(lambda: defaultdict(float))
    weights = {"classes": classes, "w": w}
    for ep in range(epochs):
        errors = 0
        for feats, gold in examples:
            pred = learned.perceptron_predict(weights, feats)
            if pred != gold:
                errors += 1
                for f in feats:
                    w[f][gold] = w[f].get(gold, 0.0) + 1.0
                    w[f][pred] = w[f].get(pred, 0.0) - 1.0
        print(f"  epoch {ep}: {errors} errors / {len(examples)}")
        if errors == 0:
            break
    clean = {
        "classes": classes,
        "w": {
            f: {c: round(v, 6) for c, v in sorted(cw.items()) if v != 0.0}
            for f, cw in sorted(w.items())
            if any(v != 0.0 for v in cw.values())
        },
    }
    return clean


def accuracy(weights, examples) -> tuple[int, int]:
    wrong = sum(1 for feats, gold in examples if learned.perceptron_predict(weights, feats) != gold)
    return wrong, len(examples)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=400)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--holdout-seed", type=int, default=909)
    args = ap.parse_args()

    failed = False
    for name, fn, out_name in (
        ("tagger", tagger_examples, "micro_tagger_weights.json"),
        ("boundary", boundary_examples, "micro_boundary_weights.json"),
    ):
        print(f"training micro_{name}")
        train_ex = fn(args.docs, args.seed)
        if name == "tagger":
            train_ex = train_ex + salad_tagger_examples()
        else:
            train_ex = train_ex + salad_boundary_examples()
        weights = train(train_ex, epochs=60)
        tw, tt = accuracy(weights, train_ex)
        held = fn(120, args.holdout_seed)
        hw, ht = accuracy(weights, held)
        print(f"  train {tt - tw}/{tt}  holdout {ht - hw}/{ht}  classes={len(weights['classes'])}")
        sw, st = (salad_docs_parity if name == "tagger" else salad_boundary_parity)(weights)
        print(f"  sf0.01 documents parity {st - sw}/{st}")
        if sw:
            failed = True
        out_path = os.path.join(KERNELS_DIR, out_name)
        with open(out_path, "w") as f:
            json.dump(weights, f, indent=1, sort_keys=True)
        import hashlib

        digest = hashlib.sha256(open(out_path, "rb").read()).hexdigest()
        print(f"  sha256 {digest}  <- update io/modelstore._CATALOG")
        if tw or hw:
            print(f"  WARNING: imperfect parity for {name}")
            failed = True
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
