#!/usr/bin/env python
"""Train the pinned-weight micro-parser (kernels/learned.py).

Deterministic: gold trees come from the rule pipeline over seeded fixture
pages; training is a plain (non-randomized) per-dependent structured
perceptron swept in corpus order. Output weights are committed at
nlp_cube_spark/kernels/micro_parser_weights.json — re-running this script
reproduces the file byte-for-byte.

    python scripts/train_micro_parser.py [--docs 400] [--seed 7]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nlp_cube_spark.datagen import gen_pages
from nlp_cube_spark.kernels import learned, mst
from nlp_cube_spark.operators.annotate import _annotate_doc


def corpus(n_docs: int, seed: int) -> list[tuple[list[str], list[int]]]:
    """(upos, gold_heads 1-based) per sentence from the rule pipeline."""
    out = []
    for page in gen_pages(n_docs, seed=seed):
        for forms, _sp, _mw, _tf, tags, heads, _lb in _annotate_doc(page["text"], page["lang"]):
            out.append(([t[0] for t in tags], [int(h) for h in heads]))
    return out


def train(sents, epochs: int = 20) -> dict[str, float]:
    w: dict[str, float] = defaultdict(float)
    for ep in range(epochs):
        errors = 0
        for upos, gold in sents:
            ctx = learned.sentence_context(upos)
            for d in range(len(upos)):
                # per-dependent argmax under current weights (ties -> smaller
                # head index, ROOT first — fixed order, no RNG)
                best_h, best_s = None, None
                for h in range(-1, len(upos)):
                    if h == d:
                        continue
                    s = sum(w[f] for f in learned.arc_features(upos, ctx, d, h))
                    if best_s is None or s > best_s:
                        best_h, best_s = h, s
                gold_h = gold[d] - 1  # 1-based w/ 0=ROOT -> 0-based w/ -1=ROOT
                if best_h != gold_h:
                    errors += 1
                    for f in learned.arc_features(upos, ctx, d, gold_h):
                        w[f] += 1.0
                    for f in learned.arc_features(upos, ctx, d, best_h):
                        w[f] -= 1.0
        print(f"epoch {ep}: {errors} errors / {sum(len(u) for u, _ in sents)} arcs")
        if errors == 0:
            break
    return dict(w)


def evaluate(weights, sents) -> tuple[int, int]:
    import numpy as np

    wrong = total = 0
    for upos, gold in sents:
        raw = learned.raw_scores(upos, weights)
        ex = np.exp(raw[1:] - raw[1:].max(axis=1, keepdims=True))
        probs = np.zeros_like(raw)
        probs[1:] = ex / ex.sum(axis=1, keepdims=True)
        probs[0, 0] = 1.0
        heads = mst.decode_tree(probs).tolist()
        total += len(gold)
        wrong += sum(1 for a, b in zip(heads, gold) if a != b)
    return wrong, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=400)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--holdout-seed", type=int, default=909)
    args = ap.parse_args()

    train_sents = corpus(args.docs, args.seed)
    weights = train(train_sents)
    weights = {k: round(v, 6) for k, v in sorted(weights.items()) if v != 0.0}

    wrong, total = evaluate(weights, train_sents)
    print(f"train (MST decode): {total - wrong}/{total} heads correct")
    held = corpus(120, args.holdout_seed)
    hw, ht = evaluate(weights, held)
    print(f"holdout seed={args.holdout_seed}: {ht - hw}/{ht} heads correct")

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "nlp_cube_spark", "kernels", "micro_parser_weights.json",
    )
    with open(out, "w") as f:
        json.dump(weights, f, indent=1, sort_keys=True)
    import hashlib

    digest = hashlib.sha256(open(out, "rb").read()).hexdigest()
    print(f"wrote {out} ({len(weights)} features)")
    print(f"sha256 {digest}  <- update io/modelstore._CATALOG")
    if wrong or hw:
        print("WARNING: imperfect parity — do not ship these weights")
        sys.exit(1)


if __name__ == "__main__":
    main()
