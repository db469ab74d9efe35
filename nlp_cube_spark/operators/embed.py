"""Word-embedding attach (reference ops #11/#12, SURVEY.md §2a).

The reference attaches per-word LM embeddings (fasttext 300-d or XLM-R
13x768) inside `LMHelper.apply` (cube/networks/lm.py:53-57,199-208) and
consumes them transiently in the parser — they are never stored. Our
contract is the same: `emb ARRAY<FLOAT>` is a TRANSIENT column produced by
one Arrow stage and consumed by the next fused kernel; this module is the
seam where a real encoder plugs in.

Two encoders behind the seam:
- `source="hash"` (v0 default): deterministic feature-hash embedding — dim
  buckets from md5 of (lower(form), slot). Engine-portable (DuckDB
  reproduces values exactly), deterministic at any parallelism.
- `source="pinned"`: LEARNED static vectors (PPMI+SVD over the seeded
  corpus, scripts/train_micro_embeddings.py) served via the modelstore —
  the fasttext-style pretrained-artifact path; OOV forms fall back to the
  hash encoder, mirroring fasttext's subword fallback role.
Both run in the same one-Arrow-stage shape and exercise the full plumbing:
Arrow batch shape, per-word array column, sentence-mean pooling, and the
reference's long-input chunking analog (inputs are processed in CHUNK-word
slices, cf. the 512-wordpiece slicing at lm.py:172-181).
"""

from __future__ import annotations

from collections.abc import Iterator
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

CHUNK = 512  # words per kernel slice (reference lm.py:172-181 analog)


def hash_embed_np(forms: list[str], dim: int) -> np.ndarray:
    """Deterministic (len(forms), dim) float64 embedding matrix."""
    import hashlib

    out = np.zeros((len(forms), dim), dtype=np.float64)
    for i, f in enumerate(forms):
        low = (f or "").lower()
        for j in range(dim):
            h = hashlib.md5(f"{low}:{j}".encode("utf-8")).hexdigest()
            out[i, j] = int(h[:15], 16) / float(1 << 60)
    return out


@lru_cache(maxsize=1)
def _pinned_vectors() -> dict:
    """Parsed-once-per-python-worker artifact cache: pinned_embed_np runs
    once per 512-word CHUNK inside the hot fused stage, and re-reading +
    re-hashing + re-parsing the ~2k-line JSON per chunk dominated the
    kernel (ADVICE r2). Same pattern as kernels.learned._tagger_weights."""
    from ..kernels.learned import _load_artifact

    return _load_artifact("micro_embeddings", "micro_embeddings.json")["vectors"]


def pinned_embed_np(forms: list[str], dim: int) -> np.ndarray:
    """Learned static vectors (modelstore artifact) with hash-embed OOV
    fallback; vectors are truncated/zero-padded to `dim`."""
    vecs = _pinned_vectors()
    out = np.zeros((len(forms), dim), dtype=np.float64)
    oov: list[int] = []
    for i, f in enumerate(forms):
        v = vecs.get((f or "").lower())
        if v is None:
            oov.append(i)
        else:
            k = min(dim, len(v))
            out[i, :k] = v[:k]
    if oov:
        out[oov] = hash_embed_np([forms[i] for i in oov], dim)
    return out


NGRAM_MIN, NGRAM_MAX = 3, 5


def _char_ngrams(low: str) -> list[str]:
    s = f"<{low}>"
    return [s[i : i + n] for n in range(NGRAM_MIN, NGRAM_MAX + 1) for i in range(len(s) - n + 1)]


@lru_cache(maxsize=1)
def _wordgram_vectors() -> dict:
    from ..kernels.learned import _load_artifact

    return _load_artifact("micro_wordgram", "micro_wordgram_vectors.json")["ngrams"]


def wordgram_embed_np(forms: list[str], dim: int) -> np.ndarray:
    """WordGram role (reference op #12): char 3-5 gram composition — the
    word vector is the MEAN of its trained gram vectors
    (scripts/train_micro_wordgram.py, fastText-style subword model fit to
    the pinned PPMI-SVD targets). In-vocabulary words reconstruct the
    pinned vectors to ~1e-6; OOV words compose from shared grams
    (morphological generalization); words sharing no gram with the
    training vocabulary fall back to the hash encoder."""
    grams = _wordgram_vectors()
    out = np.zeros((len(forms), dim), dtype=np.float64)
    oov: list[int] = []
    for i, f in enumerate(forms):
        vs = [grams[g] for g in _char_ngrams((f or "").lower()) if g in grams]
        if vs:
            m = np.asarray(vs, dtype=np.float64).mean(axis=0)
            k = min(dim, m.shape[0])
            out[i, :k] = m[:k]
        else:
            oov.append(i)
    if oov:
        out[oov] = hash_embed_np([forms[i] for i in oov], dim)
    return out


_ENCODERS = {"hash": hash_embed_np, "pinned": pinned_embed_np, "wordgram": wordgram_embed_np}


def attach_embeddings(
    words: DataFrame, dim: int = 16, form_col: str = "form", source: str = "hash"
) -> DataFrame:
    """flat words -> words + emb ARRAY<FLOAT> (one Arrow stage). `source`
    picks the encoder behind the seam; only the name crosses the closure."""
    out_schema = T.StructType(words.schema.fields + [T.StructField("emb", T.ArrayType(T.DoubleType()))])
    cols = [f.name for f in words.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from nlp_cube_spark.operators.embed import _ENCODERS as enc

        embed_fn = enc[source]
        for pdf in batches:
            if len(pdf) == 0:
                continue
            forms = list(pdf[form_col])
            embs = []
            for lo in range(0, len(forms), CHUNK):  # chunked like the reference
                embs.append(embed_fn(forms[lo : lo + CHUNK], dim))
            mat = np.concatenate(embs) if embs else np.zeros((0, dim), dtype=np.float64)
            pdf = pdf.copy()
            pdf["emb"] = [row.tolist() for row in mat]
            yield pdf

    return words.select(*cols).mapInPandas(run, schema=out_schema)


def sentence_embeddings(words_with_emb: DataFrame) -> DataFrame:
    """Mean-pool word embeddings per sentence — pure Catalyst aggregation
    over the array column (zip_with-free: posexplode + avg per slot)."""
    dim_probe = F.size(F.col("emb"))
    exploded = words_with_emb.select(
        "url", "sent_id", F.posexplode("emb").alias("slot", "v")
    )
    pooled = exploded.groupBy("url", "sent_id", "slot").agg(F.avg("v").alias("v"))
    return (
        pooled.groupBy("url", "sent_id")
        .agg(F.array_sort(F.collect_list(F.struct("slot", "v"))).alias("sv"))
        .select(
            "url",
            "sent_id",
            F.expr("transform(sv, x -> round(x.v, 6))").alias("sent_emb"),
        )
    )
