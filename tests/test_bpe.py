"""BPE trainer: merge-table + segmentation parity with an eager
pure-Python reference (Sennrich-style greedy left-to-right merges,
deterministic (freq DESC, lhs, rhs) tie-break), encode-fresh-corpus
parity with the training by-product, and edge cases (single-char words,
repeated-symbol overlap, pair exhaustion)."""

import pytest
from pyspark.sql import functions as F

from nlp_cube_spark.operators.bpe import (
    bpe_token_counts,
    segment_words,
    train_bpe,
    word_freqs,
)


def _ref_bpe(freqs: dict, n_merges: int):
    """Eager reference: dict word->freq, returns (merges, segmentation)."""
    state = {w: list(w) for w in freqs}
    merges = []
    for k in range(n_merges):
        counts = {}
        for w, f in freqs.items():
            syms = state[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (l, r), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((k, l, r, cnt))
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = out
    return merges, {w: " ".join(s) for w, s in state.items()}


def _docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick fox the the dog dog"),
        (2, "aaaa aaa aa a"),  # overlap stress: repeated symbol
        (3, "x y z"),  # single-char words: no pairs contributed
        (4, ""),  # empty doc
        (5, "banana bandana ananas"),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def test_merges_and_segmentation_match_reference(spark):
    docs = _docs(spark)
    freqs = {r.word: r.freq for r in word_freqs(docs).collect()}
    for n in (1, 4, 10):
        merges, seg = train_bpe(docs, n_merges=n)
        got = [(r.merge_rank, r.lhs, r.rhs, r.pair_freq) for r in merges.orderBy("merge_rank").collect()]
        ref_m, ref_s = _ref_bpe(freqs, n)
        assert got == ref_m
        assert {r.word: r.sym for r in seg.collect()} == ref_s


def test_pair_exhaustion_is_silent(spark):
    docs = _docs(spark).where("doc_id = 3")  # x y z: zero pairs ever
    merges, seg = train_bpe(docs, n_merges=5)
    assert merges.count() == 0
    assert {r.sym for r in seg.collect()} == {"x", "y", "z"}


def test_segment_words_matches_training_byproduct(spark):
    docs = _docs(spark)
    merges, seg = train_bpe(docs, n_merges=6)
    table = [(r.lhs, r.rhs) for r in merges.orderBy("merge_rank").collect()]
    fresh = segment_words(seg.select("word"), table)
    a = {r.word: r.sym for r in seg.collect()}
    b = {r.word: r.sym for r in fresh.collect()}
    assert a == b
    # and on genuinely unseen words the merge table still applies
    unseen = segment_words(
        spark.createDataFrame([("thequick",), ("qqq",)], "word string"), table
    ).collect()
    got = {r.word: r.n_subwords for r in unseen}
    assert got["qqq"] == 3 or got["qqq"] < 3  # whatever merges allow, but present
    assert all(r.sym.replace(" ", "") == r.word for r in unseen)  # lossless


def test_token_counts(spark):
    docs = _docs(spark)
    merges, seg = train_bpe(docs, n_merges=4)
    tc = {r.doc_id: (r.n_words, r.n_bpe_tokens) for r in
          bpe_token_counts(docs, seg).collect()}
    _, ref_s = _ref_bpe({r.word: r.freq for r in word_freqs(docs).collect()}, 4)
    for r in docs.collect():
        words = [w for w in r.text.split() if w]
        exp = (len(words), sum(len(ref_s[w].split(" ")) for w in words))
        assert tc[r.doc_id] == exp, r.doc_id
    assert tc[4] == (0, 0)  # empty doc present with zeros


def test_segment_words_hostile_symbols(spark):
    """Merge symbols are data, not SQL: quotes and backslashes from a
    real web corpus (C:\\path, don't, 5'9") must segment correctly.
    The merge application is built from Column expressions (r6 ADVICE
    closed the f-string-literal injection surface)."""
    words = spark.createDataFrame(
        [("C:\\bin",), ("don't",), ('say"hi',), ("\\\\'x",)], "word string"
    )
    merges = [("C", ":"), ("C:", "\\"), ("'", "t"), ('"', "h"), ("\\", "\\")]
    rows = {r.word: r for r in segment_words(words, merges).collect()}
    # lossless round-trip for every word, no exception, no dropped chars
    for w, r in rows.items():
        assert r.sym.replace(" ", "") == w, (w, r.sym)
    # the merges actually applied: 'C', ':' then 'C:', '\' fused
    assert rows["C:\\bin"].sym.startswith("C:\\ "), rows["C:\\bin"].sym
    assert "' t" not in rows["don't"].sym  # ("'","t") merge applied
    assert rows["\\\\'x"].sym.split(" ")[0] == "\\\\"  # ("\\","\\") applied


def test_wordpiece_prefers_exclusive_pairs(spark):
    from nlp_cube_spark.operators.bpe import train_wordpiece

    # 'xy' and 'ab' pairs both occur 4x, but a/b also appear in many
    # other contexts while x/y appear ONLY together -> wordpiece picks
    # (x, y) first (score 4/(4*4) > 4/(9*9)); frequency-scored BPE
    # would tie and fall to lexicographic (a, b).
    rows = [
        (1, "xy xy xy xy"),
        (2, "ab ab ab ab"),
        (3, "az bz az bz a b a b a b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges, seg = train_wordpiece(docs, n_merges=2)
    got = sorted(merges.collect(), key=lambda r: r.merge_rank)
    assert (got[0].lhs, got[0].rhs) == ("x", "y")
    assert got[0].pair_freq == 4
    import math
    cl = cr = 4  # x and y each occur 4x
    assert got[0].score == math.floor(4 / (cl * cr) * 1e9 + 0.5) / 1e9
    # scores are non-increasing is NOT guaranteed (counts change), but
    # every chosen pair must have been the argmax of its round: spot-check
    # round 2 merged something real
    assert got[1].pair_freq >= 1
    # segmentation by-product reflects the first merge
    sym = {r.word: r.sym for r in seg.collect()}
    assert sym["xy"] == "xy"


def test_wordpiece_parallelism_invariant(spark):
    from nlp_cube_spark.operators.bpe import train_wordpiece

    rows = [(i, f"tok{i % 7}x tok{i % 3}y za{i % 5}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    outs = []
    for p in (1, 3):
        m, _ = train_wordpiece(docs.repartition(p), n_merges=3)
        outs.append(sorted(m.collect()))
    assert outs[0] == outs[1]


def test_segment_words_applies_wordpiece_merges(spark):
    """segment_words is trainer-agnostic: a collected WordPiece merge
    table (rank order) encodes fresh words exactly like the training
    by-product segments the dimension."""
    from nlp_cube_spark.operators.bpe import segment_words, train_wordpiece

    docs = spark.createDataFrame(
        [(1, "xy xy xy xy ab ab ab ab az bz a b")], "doc_id long, text string"
    )
    merges_df, seg = train_wordpiece(docs, n_merges=2)
    merges = [(r.lhs, r.rhs) for r in
              sorted(merges_df.collect(), key=lambda r: r.merge_rank)]
    fresh = spark.createDataFrame([("xy",), ("xyxy",), ("qq",)], "word string")
    got = {r.word: r.sym for r in segment_words(fresh, merges).collect()}
    trained = {r.word: r.sym for r in seg.collect()}
    assert got["xy"] == trained["xy"]  # encode == training by-product
    assert got["qq"] == "q q"          # untouched by unseen merges
    # both learned merges fire on a fresh concatenated word
    assert got["xyxy"] in ("xy xy", "xyxy")
