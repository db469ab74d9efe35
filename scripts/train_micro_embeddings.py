#!/usr/bin/env python
"""Train pinned static word embeddings (PPMI + SVD) for the embed seam.

The reference attaches pretrained LM embeddings (fasttext / XLM-R,
cube/networks/lm.py) — an external artifact produced by offline training.
This script is our offline training: classic count-based distributional
vectors (positive PMI co-occurrence, window 2, truncated SVD, L2-norm)
over the seeded fixture corpus, committed at
nlp_cube_spark/kernels/micro_embeddings.json and served through the
modelstore. Deterministic: fixed corpus seed, SVD sign fixed by forcing
each component's max-|value| coordinate positive.

    python scripts/train_micro_embeddings.py [--docs 400] [--seed 7] [--dim 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nlp_cube_spark.datagen import gen_pages

KERNELS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "nlp_cube_spark", "kernels"
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=400)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--window", type=int, default=2)
    args = ap.parse_args()

    sents = []
    for page in gen_pages(args.docs, seed=args.seed):
        sents.append([t.lower() for t in page["text"].split(" ") if t])

    uni: Counter = Counter()
    co: Counter = Counter()
    for s in sents:
        for i, w in enumerate(s):
            uni[w] += 1
            for j in range(max(0, i - args.window), min(len(s), i + args.window + 1)):
                if j != i:
                    co[(w, s[j])] += 1

    vocab = sorted(uni)
    idx = {w: i for i, w in enumerate(vocab)}
    n = sum(uni.values())
    total_pairs = sum(co.values())
    M = np.zeros((len(vocab), len(vocab)))
    for (a, b), c in co.items():
        pmi = np.log((c / total_pairs) / ((uni[a] / n) * (uni[b] / n)))
        M[idx[a], idx[b]] = max(0.0, pmi)  # positive PMI

    U, S, _ = np.linalg.svd(M, full_matrices=False)
    k = min(args.dim, len(S))
    vec = U[:, :k] * np.sqrt(S[:k])
    # fix SVD sign ambiguity: max-|value| coordinate of each component > 0
    for j in range(k):
        m = np.argmax(np.abs(vec[:, j]))
        if vec[m, j] < 0:
            vec[:, j] = -vec[:, j]
    norms = np.linalg.norm(vec, axis=1, keepdims=True)
    vec = vec / np.maximum(norms, 1e-12)

    out = {
        "dim": int(k),
        "window": args.window,
        "corpus": {"docs": args.docs, "seed": args.seed},
        "vectors": {w: [round(float(x), 6) for x in vec[idx[w]]] for w in vocab},
    }
    path = os.path.join(KERNELS_DIR, "micro_embeddings.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {path}: {len(vocab)} words, dim {k}")
    import hashlib

    digest = hashlib.sha256(open(path, "rb").read()).hexdigest()
    print(f"sha256 {digest}  <- update io/modelstore._CATALOG")

    # sanity: distributional structure exists (verbs nearer verbs than '.')
    from nlp_cube_spark.kernels import lexicon as L

    verbs = [v for v in (x.lower() for x in L.VERBS_3SG) if v in idx]
    intra = np.mean([vec[idx[a]] @ vec[idx[b]] for a in verbs for b in verbs if a != b])
    to_punct = np.mean([vec[idx[a]] @ vec[idx["."]] for a in verbs]) if "." in idx else 0.0
    print(f"sanity: mean verb-verb cos {intra:.3f} vs verb-'.' cos {to_punct:.3f}")
    if intra <= to_punct:
        print("WARNING: no distributional structure")
        sys.exit(1)


if __name__ == "__main__":
    main()
