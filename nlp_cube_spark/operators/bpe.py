"""Distributed BPE tokenizer training + corpus encoding.

Byte-pair encoding (Sennrich, Haddow & Birch 2016, "Neural Machine
Translation of Rare Words with Subword Units") learned Spark-first:

1. one corpus scan builds the *word-frequency dimension* — every
   published BPE trainer (subword-nmt, SentencePiece, HF tokenizers)
   learns merges from aggregated word counts, never from raw text, so
   the expensive input collapses to (word, freq) after a single
   map-side-combined hash agg.  The dimension is capped at `max_words`
   by a deterministic (freq DESC, word ASC) top-K (TakeOrdered — each
   partition keeps K, no global sort), the same practical cap
   SentencePiece applies; at web scale this bounds every later pass.
2. per merge iteration (the Lloyd-loop pattern of
   similarity.kmeans_refine): adjacent symbol pairs are extracted with
   posexplode + a lead window partitioned by word (partition size =
   symbols of ONE word), summed into pair frequencies — an agg over the
   *dimension*, the corpus is never rescanned — and the argmax pair
   (freq DESC, lhs ASC, rhs ASC: ties are deterministic, counts are
   exact integers, so the whole trajectory is bit-identical across
   engines with no float rounding discipline needed) is attached back
   as a 1-row broadcast scalar.  The merge is applied with the
   overlap-safe double-space replace (double every separator so
   consecutive occurrences of the pair no longer share a boundary
   space, replace, collapse): pure string built-ins, codegen'd, and
   byte-identical in DuckDB, which is what makes the *training loop
   itself* hash-oracle-able as an unrolled CTE chain
   (__spark_entry__._bpe_duck).  localCheckpoint per iteration bounds
   the plan like kmeans_refine/pagerank.
3. encoding a corpus applies the learned merge table (model-sized —
   collecting it is collecting the model, like kernel weights) to the
   dedup-then-join word dimension (the lemmatizer pattern,
   annotate.py): distinct words get the full merge chain as nested
   static replaces, then join back per (doc, word) counts.  Each merge
   costs three string ops per *distinct word*, not per token.

Reference scope: the reference pipeline consumes externally-trained
subword vocabularies (cube/io_utils/encodings.py builds vocabs from
conllu token counts); this module adds the training half a 100 TB
corpus pipeline needs to produce such a vocab in the first place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Overlap-safe single-merge application: pad, double every space so
# consecutive pair occurrences stop sharing boundary spaces, replace the
# doubled-form pair ' l  r ' with ' lr ', collapse runs, trim.  Greedy
# left-to-right, matching subword-nmt's re-based merge.  Built from
# Column expressions (never interpolated SQL literals) so merge symbols
# containing quotes or backslashes — both reachable from a real web
# corpus — can never produce an invalid or semantically wrong literal.
def _merge_apply(sym: F.Column, l: F.Column, r: F.Column) -> F.Column:
    doubled = F.replace(
        F.concat(F.lit(" "), sym, F.lit(" ")), F.lit(" "), F.lit("  ")
    )
    merged = F.replace(
        doubled,
        F.concat(F.lit(" "), l, F.lit("  "), r, F.lit(" ")),
        F.concat(F.lit(" "), l, r, F.lit(" ")),
    )
    return F.trim(F.regexp_replace(merged, " +", " "))


def word_freqs(
    docs: DataFrame, text_col: str = "text", max_words: int = 65536
) -> DataFrame:
    """(word, freq) dimension: one hash agg over the corpus, capped by a
    deterministic top-K.  freq is BIGINT (exact — no float discipline
    needed anywhere downstream)."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), "\\s+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(max_words)
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 16,
    text_col: str = "text",
    max_words: int = 65536,
) -> tuple[DataFrame, DataFrame]:
    """Learn `n_merges` BPE merges from `docs`.

    Returns (merges, segmented):
      merges:    (merge_rank INT, lhs, rhs, pair_freq BIGINT) — the model, in
                 merge order; an iteration with no remaining pair
                 contributes no row (both engines agree).
      segmented: (word, freq, sym) — the final space-separated subword
                 segmentation of every dimension word (free by-product
                 of training; encoding the training corpus needs no
                 re-application).
    """
    state = (
        word_freqs(docs, text_col, max_words)
        .select(
            "word",
            "freq",
            F.concat_ws(" ", F.split(F.col("word"), "")).alias("sym"),
        )
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("word").orderBy("pos")
    bests = []
    for k in range(n_merges):
        pairs = (
            state.select(
                "word", "freq", F.posexplode(F.split("sym", " ")).alias("pos", "l")
            )
            .withColumn("r", F.lead("l").over(w))
            .where(F.col("r").isNotNull())
            .groupBy("l", "r")
            .agg(F.sum("freq").alias("cnt"))
        )
        best = (
            pairs.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .localCheckpoint(eager=False)
        )
        bests.append(
            best.select(
                F.lit(k).cast("int").alias("merge_rank"),
                F.col("l").alias("lhs"),
                F.col("r").alias("rhs"),
                F.col("cnt").cast("bigint").alias("pair_freq"),
            )
        )
        state = (
            state.join(F.broadcast(best.select("l", "r")), F.lit(True), "left")
            .select(
                "word",
                "freq",
                F.when(F.col("l").isNull(), F.col("sym"))
                .otherwise(_merge_apply(F.col("sym"), F.col("l"), F.col("r")))
                .alias("sym"),
            )
            .localCheckpoint(eager=False)
        )
    merges = bests[0]
    for b in bests[1:]:
        merges = merges.unionByName(b)
    return merges, state


def segment_words(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a collected merge table (the model — bounded by n_merges) to
    a (word, ...) frame, adding `sym` (subword string) and `n_subwords`.
    Nested static replaces: codegen'd, three string ops per merge per
    DISTINCT word.  Merge symbols enter as F.lit Columns, never as
    interpolated SQL text, so quotes/backslashes in corpus tokens are
    inert data."""
    sym = F.concat_ws(" ", F.split(F.col("word"), ""))
    for l, r in merges:
        sym = _merge_apply(sym, F.lit(l), F.lit(r))
    return words.withColumn("sym", sym).withColumn(
        "n_subwords", F.size(F.split("sym", " "))
    )


def bpe_token_counts(
    docs: DataFrame,
    segmented: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document BPE token counts given a (word, sym) segmentation
    (from train_bpe's by-product or segment_words on a fresh corpus).
    Dedup-then-join: the corpus explodes once to (doc, word) counts and
    joins the word dimension; empty docs keep 0/0.  The dimension join
    is left to AQE (broadcast at closed-vocab scale, shuffle join at
    web-vocab scale — the same call works for both)."""
    wc = (
        docs.select(id_col, F.explode(F.split(F.col(text_col), "\\s+")).alias("word"))
        .where(F.col("word") != "")
        .groupBy(id_col, "word")
        .agg(F.count("*").alias("n"))
    )
    dim = segmented.select(
        "word", F.size(F.split("sym", " ")).cast("bigint").alias("n_subwords")
    )
    per_doc = (
        wc.join(dim, "word")
        .groupBy(id_col)
        .agg(
            F.sum("n").alias("w"),
            F.sum(F.col("n") * F.col("n_subwords")).alias("t"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("w"), F.lit(0)).cast("bigint").alias("n_words"),
            F.coalesce(F.col("t"), F.lit(0)).cast("bigint").alias("n_bpe_tokens"),
        )
    )


def train_wordpiece(
    docs: DataFrame,
    n_merges: int = 12,
    text_col: str = "text",
    max_words: int = 65536,
) -> tuple[DataFrame, DataFrame]:
    """WordPiece merge training (Schuster & Nakajima 2012; the BERT
    tokenizer's trainer): the BPE loop with LIKELIHOOD-scored merge
    selection — pick the pair maximizing

        score(l, r) = count(l, r) / (count(l) * count(r)),

    the pair whose merge most increases a unigram LM's corpus
    likelihood, instead of raw pair frequency (Sennrich BPE).

    Returns (merges, segmented) like train_bpe; merges carries
    (merge_rank, lhs, rhs, pair_freq, score) with score floor-rounded
    9dp. Determinism: scores are one IEEE division of exact integer
    counts — identical doubles on every engine — and ties break on
    (l, r); the whole trajectory replays in SQL.

    Plan shape == train_bpe (one corpus scan, then per merge a
    dimension-sized pair agg + symbol-count agg + 1-row broadcast
    argmax + codegen'd merge apply); the symbol explode is recomputed
    for the two aggs — it hangs off the per-round checkpoint leaf, so
    the re-run is the dimension explode only, never the corpus.
    """
    state = (
        word_freqs(docs, text_col, max_words)
        .select(
            "word",
            "freq",
            F.concat_ws(" ", F.split(F.col("word"), "")).alias("sym"),
        )
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("word").orderBy("pos")
    bests = []
    for k in range(n_merges):
        toks = state.select(
            "word", "freq", F.posexplode(F.split("sym", " ")).alias("pos", "l")
        )
        cs = toks.groupBy(F.col("l").alias("s")).agg(F.sum("freq").alias("c"))
        pairs = (
            toks.withColumn("r", F.lead("l").over(w))
            .where(F.col("r").isNotNull())
            .groupBy("l", "r")
            .agg(F.sum("freq").alias("cnt"))
        )
        scored = (
            pairs.join(cs.select(F.col("s").alias("l"), F.col("c").alias("cl")), "l")
            .join(cs.select(F.col("s").alias("r"), F.col("c").alias("cr")), "r")
            .withColumn(
                "score",
                F.expr(
                    "cast(cnt as double) / (cast(cl as double) * cast(cr as double))"
                ),
            )
        )
        best = (
            scored.orderBy(F.desc("score"), F.asc("l"), F.asc("r"))
            .limit(1)
            .localCheckpoint(eager=False)
        )
        bests.append(
            best.select(
                F.lit(k).cast("int").alias("merge_rank"),
                F.col("l").alias("lhs"),
                F.col("r").alias("rhs"),
                F.col("cnt").cast("bigint").alias("pair_freq"),
                (F.floor(F.col("score") * 1e9 + F.lit(0.5)) / 1e9).alias("score"),
            )
        )
        state = (
            state.join(F.broadcast(best.select("l", "r")), F.lit(True), "left")
            .select(
                "word",
                "freq",
                F.when(F.col("l").isNull(), F.col("sym"))
                .otherwise(_merge_apply(F.col("sym"), F.col("l"), F.col("r")))
                .alias("sym"),
            )
            .localCheckpoint(eager=False)
        )
    merges = bests[0]
    for b in bests[1:]:
        merges = merges.unionByName(b)
    return merges, state
