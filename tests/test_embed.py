"""Word-embedding attach seam tests (#11/#12)."""

import numpy as np
from pyspark.sql import functions as F

from nlp_cube_spark.datagen import pages_df
from nlp_cube_spark.operators import annotate as A
from nlp_cube_spark.operators.embed import attach_embeddings, hash_embed_np, sentence_embeddings


def test_hash_embed_deterministic_and_chunk_invariant():
    forms = [f"w{i}" for i in range(1200)]  # > CHUNK to cross slices
    a = hash_embed_np(forms, 8)
    b = np.concatenate([hash_embed_np(forms[:512], 8), hash_embed_np(forms[512:1024], 8), hash_embed_np(forms[1024:], 8)])
    assert np.array_equal(a, b)
    assert a.shape == (1200, 8) and 0 <= a.min() and a.max() < 1


def test_attach_embeddings_spark(spark):
    words = A.annotate(pages_df(spark, 6, seed=8))
    emb = attach_embeddings(words, dim=8)
    rows = emb.select("form", "emb").collect()
    assert all(len(r.emb) == 8 for r in rows)
    # value = pure function of lower(form)
    by_form = {}
    for r in rows:
        key = r.form.lower()
        if key in by_form:
            assert by_form[key] == r.emb
        by_form[key] = r.emb

    sent = sentence_embeddings(emb)
    srows = sent.collect()
    assert all(len(r.sent_emb) == 8 for r in srows)
    # pooled value spot-check for a single-word check: mean == word emb
    one = emb.where((F.col("sent_id") == 0)).limit(0)  # structural only
    assert sent.count() == words.select("url", "sent_id").dropDuplicates().count()


def test_pinned_embeddings_seam(spark):
    """Learned PPMI-SVD vectors behind the same one-Arrow-stage seam:
    in-vocab forms get the committed unit vectors, OOV falls back to the
    hash encoder, and the plan shape is identical to the hash source."""
    import numpy as np
    from pyspark.sql import functions as F

    from nlp_cube_spark.operators import embed as E

    toks = spark.createDataFrame(
        [("u", "joins"), ("u", "merges"), ("u", "ZZZ-oov-ZZZ")], "url string, form string"
    )
    pinned = E.attach_embeddings(toks, dim=16, source="pinned")
    rows = {r.form: np.array(r.emb) for r in pinned.collect()}
    assert abs(np.linalg.norm(rows["joins"]) - 1.0) < 1e-5  # committed unit vector
    oov_hash = E.hash_embed_np(["ZZZ-oov-ZZZ"], 16)[0]
    assert np.allclose(rows["ZZZ-oov-ZZZ"], oov_hash)  # OOV fallback
    p_h = E.attach_embeddings(toks, dim=16)._jdf.queryExecution().executedPlan().toString()
    p_p = pinned._jdf.queryExecution().executedPlan().toString()
    assert p_h.count("MapInPandas") == p_p.count("MapInPandas") == 1
    assert p_h.count("Exchange") == p_p.count("Exchange")


def test_pinned_embeddings_have_distributional_structure():
    """The committed vectors are genuinely learned: verbs are closer to
    verbs than to sentence punctuation (PPMI+SVD structure)."""
    import numpy as np

    from nlp_cube_spark.kernels import lexicon as L
    from nlp_cube_spark.kernels.learned import _load_artifact

    art = _load_artifact("micro_embeddings", "micro_embeddings.json")
    vecs = {w: np.array(v) for w, v in art["vectors"].items()}
    verbs = [v.lower() for v in L.VERBS_3SG if v.lower() in vecs]
    intra = np.mean([vecs[a] @ vecs[b] for a in verbs for b in verbs if a != b])
    to_punct = np.mean([vecs[a] @ vecs["."] for a in verbs])
    assert intra > to_punct


def test_wordgram_reconstructs_pinned_vectors():
    """Char-ngram composition reproduces the PPMI-SVD targets on the
    training vocabulary to the committed rounding precision (fastText-style
    subword fit, scripts/train_micro_wordgram.py)."""
    import numpy as np

    from nlp_cube_spark.kernels.learned import _load_artifact
    from nlp_cube_spark.operators import embed as E

    art = _load_artifact("micro_embeddings", "micro_embeddings.json")
    vocab = sorted(art["vectors"])
    got = E.wordgram_embed_np(vocab, 16)
    want = np.array([art["vectors"][w][:16] for w in vocab])
    assert np.abs(got - want).max() < 1e-4


def test_wordgram_oov_composition_and_fallback():
    import numpy as np

    from nlp_cube_spark.operators import embed as E

    def cos(a, b):
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    # morphological OOV: shares most grams with an in-vocab word
    base, oov, unrelated = E.wordgram_embed_np(["admires", "admiring", "window"], 16)
    assert cos(base, oov) > cos(base, unrelated)
    # no shared gram at all -> deterministic hash fallback
    w = E.wordgram_embed_np(["qqqq"], 8)
    assert np.allclose(w, E.hash_embed_np(["qqqq"], 8))
    # deterministic across calls and chunk boundaries
    a = E.wordgram_embed_np(["admires", "qqqq", "window"], 8)
    b = np.concatenate([E.wordgram_embed_np(["admires"], 8),
                        E.wordgram_embed_np(["qqqq", "window"], 8)])
    assert np.array_equal(a, b)


def test_wordgram_seam_spark(spark):
    from pyspark.sql import functions as F

    from nlp_cube_spark.operators import embed as E

    toks = spark.createDataFrame(
        [(1, "admires"), (1, "banana"), (2, "qqqq")], "doc_id long, form string"
    )
    out = E.attach_embeddings(toks, dim=8, source="wordgram")
    rows = out.collect()
    assert len(rows) == 3 and all(len(r.emb) == 8 for r in rows)
    p = out._jdf.queryExecution().executedPlan().toString()
    assert p.count("MapInPandas") == 1 and p.count("Exchange") == 0
