#!/usr/bin/env python
"""Train the pinned char-ngram WordGram encoder (operators/embed.py).

Plays the role of the reference's character-level word encoder (WordGram,
languasito/networks.py — char n-gram composition feeding word vectors;
fastText-style subword embeddings are the public-knowledge model). The
word embedding is the MEAN of its char 3-5 gram vectors over '<'+word+'>';
gram vectors are fit by least squares so that composition reconstructs the
pinned PPMI-SVD word vectors (micro_embeddings.json) on the training
vocabulary — after training, any OOV word composes an embedding from the
grams it shares with the vocabulary (morphological generalization), with
the hash encoder as the no-known-gram fallback.

Deterministic: lstsq over a fixed incidence matrix; vectors rounded to 6
decimals before committing (also what makes the DuckDB oracle replay
exact).

    python scripts/train_micro_wordgram.py
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KERNELS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "nlp_cube_spark", "kernels"
)

NGRAM_MIN, NGRAM_MAX = 3, 5


def char_ngrams(word: str) -> list[str]:
    s = f"<{word.lower()}>"
    return [s[i : i + n] for n in range(NGRAM_MIN, NGRAM_MAX + 1) for i in range(len(s) - n + 1)]


def main():
    src = json.load(open(os.path.join(KERNELS_DIR, "micro_embeddings.json")))
    vecs = src["vectors"]
    dim = src["dim"]
    vocab = sorted(vecs)
    grams = sorted({g for w in vocab for g in char_ngrams(w)})
    gidx = {g: i for i, g in enumerate(grams)}

    A = np.zeros((len(vocab), len(grams)))
    V = np.zeros((len(vocab), dim))
    for r, w in enumerate(vocab):
        gs = char_ngrams(w)
        for g in gs:
            A[r, gidx[g]] += 1.0 / len(gs)  # mean composition
        V[r] = vecs[w][:dim]

    G, *_ = np.linalg.lstsq(A, V, rcond=None)  # min-norm exact fit (rank <= |vocab|)
    G = np.round(G, 6)  # the committed (and oracle-replayed) precision
    recon = A @ G
    err = float(np.abs(recon - V).max())
    cos = float(
        np.min(
            np.sum(recon * V, axis=1)
            / np.maximum(np.linalg.norm(recon, axis=1) * np.linalg.norm(V, axis=1), 1e-12)
        )
    )
    print(f"grams={len(grams)} dim={dim} max_abs_err={err:.2e} min_cosine={cos:.6f}")

    artifact = {
        "dim": dim,
        "ngram_min": NGRAM_MIN,
        "ngram_max": NGRAM_MAX,
        "source": "micro_embeddings.json (PPMI-SVD targets)",
        "ngrams": {g: [round(float(x), 6) for x in G[i]] for g, i in gidx.items()},
    }
    out_path = os.path.join(KERNELS_DIR, "micro_wordgram_vectors.json")
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    digest = hashlib.sha256(open(out_path, "rb").read()).hexdigest()
    print(f"wrote {out_path}")
    print(f"sha256 {digest}  <- update io/modelstore._CATALOG")
    if err > 1e-3:
        print("WARNING: reconstruction too loose — do not ship")
        sys.exit(1)


if __name__ == "__main__":
    main()
