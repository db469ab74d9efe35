"""Web-corpus cleaning rule-sets: C4 line filtering and Gopher document
quality gates, plus per-source capped sampling.

These are the published filters every large web-text training pipeline
applies before dedup/mixing (no counterpart in the reference — LLM-data
pipeline scope, same family as operators/curate.py):

- C4 (Raffel et al. 2020, arXiv:1910.10683 §2.2): line-level cleanup —
  keep lines that end in terminal punctuation, have >= a minimum word
  count, and contain no blocklisted phrase or curly brace; drop the
  document if too few lines survive.
- Gopher (Rae et al. 2021, arXiv:2112.11446 §A1.1): document-level
  quality gates — word count bounds, mean word length bounds, symbol
  and bullet/ellipsis line ratios, alphabetic-word fraction, minimum
  stop-word hits.
- Per-source caps (RefinedWeb / CCNet practice): bound any one
  domain/source's contribution to the corpus.

Everything is pure relational Spark (split/explode/aggregate/window —
codegen'd, no python workers), fully DuckDB-oracle-replayable, and
shuffles only on (doc_id) or (source): at 100 TB the line explode is
map-side (posexplode feeding a per-doc re-agg keyed on the parquet
partitioning), the quality gates are a single projection + agg, and the
source cap is one window over the source key (salt a pathological
mega-source first — the operators/salting.py discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# C4's "bad words" list is long and externally maintained; these are the
# structural phrases from the paper that travel with the algorithm.
C4_BLOCKLIST = ("lorem ipsum", "javascript")
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def c4_line_verdicts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 3,
    require_terminal_punct: bool = True,
    blocklist: tuple[str, ...] = C4_BLOCKLIST,
    drop_brace: bool = True,
) -> DataFrame:
    """Per-line C4 verdicts: (id_col, line_id, line, n_words, keep,
    reason).  `reason` is the FIRST failed rule in the paper's order
    (punct -> short -> brace -> blocklist), NULL when kept.  Lines are
    `text` split on newlines; empty/whitespace-only lines are dropped as
    'empty'.  One posexplode + one projection — no shuffle at all until
    a consumer aggregates."""
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_id", "line"),
    ).select(id_col, "line_id", F.trim("line").alias("line"))
    n_words = F.size(F.filter(F.split("line", " +"), lambda t: t != ""))
    low = F.lower(F.col("line"))
    blocked = F.lit(False)
    for phrase in blocklist:
        blocked = blocked | low.contains(phrase.lower())
    reason = (
        F.when(F.col("line") == "", "empty")
        .when(
            F.lit(require_terminal_punct)
            & ~F.col("line").rlike('[.!?"”]$'),
            "no_terminal_punct",
        )
        .when(n_words < min_words_per_line, "too_short")
        .when(F.lit(drop_brace) & F.col("line").contains("{"), "brace")
        .when(blocked, "blocklist")
    )
    return lines.select(
        id_col,
        "line_id",
        "line",
        n_words.cast("bigint").alias("n_words"),
        reason.isNull().alias("keep"),
        reason.alias("reason"),
    )


def c4_clean_docs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_lines: int = 1,
    **line_kwargs,
) -> DataFrame:
    """Document-level C4 result: surviving lines re-joined in order
    (array_sort over (line_id, line) structs — no per-doc sort shuffle
    beyond the one hash agg), with kept/dropped counts; documents with
    fewer than `min_lines` surviving lines are dropped entirely (the
    paper drops pages with too little content left)."""
    v = c4_line_verdicts(docs, id_col, text_col, **line_kwargs)
    agg = v.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("keep"), F.struct("line_id", "line"))
                    )
                ),
                lambda x: x["line"],
            ),
        ).alias("clean_text"),
        F.coalesce(F.sum(F.col("keep").cast("bigint")), F.lit(0)).alias(
            "n_lines_kept"
        ),
        F.coalesce(F.sum((~F.col("keep")).cast("bigint")), F.lit(0)).alias(
            "n_lines_dropped"
        ),
    )
    return agg.where(F.col("n_lines_kept") >= min_lines)


def gopher_quality(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
    stops: tuple[str, ...] = GOPHER_STOPS,
) -> DataFrame:
    """Gopher §A1.1 document gates as one projection: per doc the word
    count, mean word length, symbol-to-word ratio (# and ... per word),
    fraction of words with >= 1 alphabetic char, and the count of
    distinct stop words present; `keep` requires every gate, `reason`
    names the first failure in the paper's listing order.  Mean word
    length uses engine-portable floor(x*1e6+0.5)/1e6 rounding (the
    CLAUDE.md weighted-sum discipline) so the boundary never straddles
    engines."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), "\\s+"), lambda t: t != "")
    out = docs.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.col(text_col).alias("_t"),
    ).select(
        id_col,
        F.size("_toks").cast("bigint").alias("n_words"),
        (
            F.floor(
                F.aggregate(
                    "_toks", F.lit(0).cast("bigint"), lambda a, t: a + F.length(t)
                ).cast("double")
                / F.nullif(F.size("_toks").cast("double"), F.lit(0.0))
                * 1e6
                + F.lit(0.5)
            )
            / 1e6
        ).alias("mean_word_len"),
        (
            (
                F.length("_t")
                - F.length(F.regexp_replace("_t", "[#]|\\.\\.\\.", ""))
            ).cast("double")
            / F.nullif(F.size("_toks").cast("double"), F.lit(0.0))
        ).alias("symbol_ratio"),
        (
            F.size(F.filter("_toks", lambda t: t.rlike("[a-z]"))).cast("double")
            / F.nullif(F.size("_toks").cast("double"), F.lit(0.0))
        ).alias("alpha_frac"),
        F.size(
            F.array_intersect(
                F.array_distinct("_toks"),
                F.array(*[F.lit(s) for s in stops]),
            )
        ).cast("bigint").alias("stop_hits"),
    )
    reason = (
        F.when(F.col("n_words") < min_words, "too_few_words")
        .when(F.col("n_words") > max_words, "too_many_words")
        .when(F.col("mean_word_len") < min_mean_word_len, "mean_word_len_low")
        .when(F.col("mean_word_len") > max_mean_word_len, "mean_word_len_high")
        .when(F.col("symbol_ratio") > max_symbol_ratio, "symbol_ratio")
        .when(F.col("alpha_frac") < min_alpha_frac, "alpha_frac")
        .when(F.col("stop_hits") < min_stop_hits, "stop_words")
    )
    return out.select(
        id_col,
        "n_words",
        "mean_word_len",
        # floor(x*1e6+0.5)/1e6, not round(): pure-double half-up that is
        # bit-identical across engines (the CLAUDE.md straddle lesson)
        (F.floor(F.col("symbol_ratio") * 1e6 + F.lit(0.5)) / 1e6).alias(
            "symbol_ratio"
        ),
        (F.floor(F.col("alpha_frac") * 1e6 + F.lit(0.5)) / 1e6).alias(
            "alpha_frac"
        ),
        "stop_hits",
        reason.isNull().alias("keep"),
        reason.alias("reason"),
    )


def cap_per_source(
    docs: DataFrame,
    n: int = 10,
    source_col: str = "source",
    id_col: str = "doc_id",
    order_col: str = "n_chars",
) -> DataFrame:
    """Per-source contribution cap (RefinedWeb/CCNet practice: no one
    domain dominates the corpus): keep the top `n` documents per source
    by `order_col` DESC, ties to the smallest id — a single window over
    the source key.  Returns (id_col, source_col, order_col, rank).
    At 100 TB the window partitions by source — a mega-source only
    needs its own top-n, which Spark computes with a partial top-k per
    map task before the shuffle (rank <= n prunes early under AQE);
    for truly degenerate single-source corpora pre-aggregate with the
    salting module."""
    w = Window.partitionBy(source_col).orderBy(
        F.desc(order_col), F.asc(id_col)
    )
    return (
        docs.select(id_col, source_col, order_col)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n)
    )


def ccnet_ppl_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    k: float = 0.5,
) -> DataFrame:
    """CCNet perplexity bucketing (Wenzek et al. 2020, "CCNet: Extracting
    High Quality Monolingual Datasets from Web Crawl Data", §4.4): split
    each language's documents into head / middle / tail terciles of LM
    perplexity — the head tercile is what the paper keeps for training.
    The paper's per-language KenLM is stood in for by the corpus's own
    per-language add-k unigram LM (the deterministic device of
    unigram_perplexity / doremi_weights).

    Returns (id_col, lang_col, n_tokens, cross_entropy, ppl_bucket) for
    every document with at least one token (CCNet drops empty pages).

    100 TB shape: per-language LM by one (lang, term) hash agg; scoring
    joins on (lang, term) — the open-vocab LM dimension is deliberately
    NOT broadcast; the per-language normalizers (nv) are a
    languages-sized broadcast. Tercile assignment needs a per-language
    GLOBAL rank — done WITHOUT a single-task sort via the shared
    exclusive-prefix-sum device (content-derived range buckets +
    broadcast offsets, operators/ranges.py), then the closed-form ntile
    formula; the oracle replays it as plain ntile(3) OVER (PARTITION BY
    lang), which is provably identical on the (ce_nano, id) total order.

    Exactness: per-doc cross-entropy is BIGINT nano-units (quantized
    per-term ln once, integer sums, floor div) — summation-order
    independent, so tercile MEMBERSHIP cannot flip with partitioning.
    """
    from .ranges import exclusive_prefix_sum

    toks = docs.select(
        F.col(id_col), F.col(lang_col),
        F.explode(F.split(F.col(text_col), "\\s+")).alias("_t"),
    ).where(F.col("_t") != "")
    tf = toks.groupBy(lang_col, id_col, "_t").agg(F.count(F.lit(1)).alias("_tf"))
    lm = tf.groupBy(lang_col, "_t").agg(F.sum("_tf").alias("_c"))
    nv = lm.groupBy(lang_col).agg(
        F.sum("_c").alias("_N"), F.count(F.lit(1)).alias("_V")
    )
    lp = lm.join(F.broadcast(nv), lang_col).select(
        lang_col, "_t",
        F.floor(
            F.log((F.col("_c") + k) / (F.col("_N") + k * F.col("_V"))) * 1e9
            + F.lit(0.5)
        ).cast("bigint").alias("_lp_nano"),
    )
    ce = (
        tf.join(lp, [lang_col, "_t"])
        .groupBy(lang_col, id_col)
        .agg(
            F.sum("_tf").alias("n_tokens"),
            (-F.sum(F.col("_tf") * F.col("_lp_nano"))).alias("_num"),
        )
        .withColumn("_ce_nano", F.expr("_num div n_tokens"))
    )
    ranked = exclusive_prefix_sum(
        ce.select(lang_col, id_col, "n_tokens", "_ce_nano"),
        [F.col(lang_col), F.col("_ce_nano"), F.col(id_col)],
        F.lit(1),
        out_col="_pre",
    )
    dims = ranked.groupBy(lang_col).agg(
        F.min("_pre").alias("_off"), F.count(F.lit(1)).alias("_n")
    )
    out = ranked.join(F.broadcast(dims), lang_col).withColumn(
        "_rk1", F.col("_pre") - F.col("_off") + 1
    )
    # closed-form ntile(3): n = 3q + r; first r tiles take q+1 rows.
    # q = 0 is safe: rank1 <= n = r keeps evaluation in the first branch.
    tile = F.expr(
        "CASE WHEN _rk1 <= (_n div 3 + 1) * (_n % 3) "
        "     THEN (_rk1 - 1) div (_n div 3 + 1) + 1 "
        "     ELSE _n % 3 + (_rk1 - (_n div 3 + 1) * (_n % 3) - 1) div (_n div 3) + 1 END"
    )
    return out.select(
        id_col, lang_col, "n_tokens",
        ((F.expr("_ce_nano div 1000L")) / F.lit(1e6)).alias("cross_entropy"),
        F.when(tile == 1, F.lit("head"))
        .when(tile == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("ppl_bucket"),
    )
