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
        weights = train(train_ex)
        tw, tt = accuracy(weights, train_ex)
        held = fn(120, args.holdout_seed)
        hw, ht = accuracy(weights, held)
        print(f"  train {tt - tw}/{tt}  holdout {ht - hw}/{ht}  classes={len(weights['classes'])}")
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
