"""Training-corpus curation: benchmark decontamination + PII scrubbing.

Two standard steps of an LLM data pipeline that sit between dedup and
shard packing (public knowledge: GPT-3 appendix C's 13-gram overlap
rule; C4's regex scrubbing):

- `decontaminate`: flag training documents sharing any whitespace
  n-gram with an evaluation/benchmark set. The benchmark side is small
  by construction (eval sets are thousands of docs, not billions), so
  its distinct n-gram hashes BROADCAST; the training side streams
  through explode -> broadcast-hash-join -> distinct doc ids. No
  shuffle touches the full corpus' n-grams.
- `scrub_pii`: redact email addresses and phone-number-shaped digit
  runs, counting the redactions per doc. Pure per-row regexp
  expressions (whole-stage codegen; dialect kept inside the
  Java-regex/RE2 common subset so the DuckDB oracle replays exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Patterns restricted to the Java-regex ∩ RE2 common subset (no
# backrefs, no lookaround) so engine and oracle agree byte-for-byte.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PHONE_RE = "[+]?[0-9][0-9 -]{7,}[0-9]"


def _check_reserved(df: DataFrame, reserved: set[str], op: str) -> None:
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"{op}: input already has column(s) {sorted(clash)} reserved "
            "for the output — rename them first"
        )


def _gram_set(df: DataFrame, id_col: str | None, text_col: str, n: int) -> DataFrame:
    from .textstats import ngrams_sql  # THE n-gram definition (shared)

    grams = F.explode(F.expr(ngrams_sql(text_col, n))).alias("gram")
    cols = ([F.col(id_col)] if id_col else []) + [grams]
    return df.select(*cols)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """docs + boolean `contaminated`: true when the doc shares at least
    one whitespace n-gram with `benchmark` (GPT-3-style overlap rule;
    n=13 is the published default — lower it for short-token corpora).

    Plan: benchmark distinct grams (small, broadcast) -> training grams
    explode -> broadcast hash join -> distinct contaminated ids -> left
    join back. The training corpus is never shuffled on gram."""
    _check_reserved(docs, {"gram", "contaminated"}, "decontaminate")
    bench = _gram_set(benchmark, None, bench_text_col, n).dropDuplicates()
    hits = (
        _gram_set(docs, id_col, text_col, n)
        .join(F.broadcast(bench), "gram")
        .select(id_col)
        .dropDuplicates()
        .withColumn("contaminated", F.lit(True))
    )
    return docs.join(hits, id_col, "left").withColumn(
        "contaminated", F.coalesce(F.col("contaminated"), F.lit(False))
    )


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails then phone-shaped digit runs, with per-doc counts.

    Order matters and is part of the contract: emails are replaced
    FIRST (an address like user123@host.com contains digit runs), then
    phones are counted/replaced on the email-scrubbed text."""
    _check_reserved(docs, {"n_emails", "n_phones", "scrubbed"}, "scrub_pii")
    after_email_sql = f"regexp_replace({text_col}, '{EMAIL_RE}', '<EMAIL>')"
    return docs.select(
        "*",
        F.size(F.expr(f"regexp_extract_all({text_col}, '{EMAIL_RE}', 0)")).alias(
            "n_emails"
        ),
        F.size(
            F.expr(f"regexp_extract_all({after_email_sql}, '{PHONE_RE}', 0)")
        ).alias("n_phones"),
        F.expr(
            f"regexp_replace({after_email_sql}, '{PHONE_RE}', '<PHONE>')"
        ).alias("scrubbed"),
    )


def dsir_weights(
    docs: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    target_text_col: str = "text",
    n_buckets: int = 4096,
    k: float = 0.5,
) -> DataFrame:
    """DSIR importance-resampling weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every raw-corpus document by how target-domain-like it is, as the
    log-likelihood ratio between two hashed-n-gram bag models,

        log w(x) = sum over x's features of  c_f(x) * (ln p_target(f)
                                                       - ln p_raw(f)),

    where features are unigrams + bigrams hashed into `n_buckets`
    buckets and both models are add-k smoothed over the bucket space.
    Documents with high log_weight are up-sampled when composing a
    domain-targeted training mix.

    Returns (id_col, n_features, log_weight, log_weight_per_feat);
    documents with no features keep NULL weights (the ppl convention).

    Plan shape: the bucket space is FIXED (n_buckets), so both LMs are
    <= n_buckets rows — trained by one hash agg each and legitimately
    BROADCAST (contrast unigram_perplexity, whose open-vocab term
    dimension deliberately is not); the corpus streams through one
    explode -> (doc, bucket) agg -> two broadcast joins -> one doc agg.
    No corpus-sized shuffle key other than (doc, bucket).

    Rounding discipline: the per-bucket log-ratio is floor-rounded at
    9dp (engine ln() implementations agree to ~1 ulp; rounding makes
    the summands cross-engine-identical) and then accumulated as
    INTEGER nano-units (BIGINT sum of dc * ratio*1e9) — exact and
    summation-order-independent, so the doc total cannot straddle a
    rounding boundary on partition order the way a double sum can
    (observed: one sf0.01 doc flipped 1e-6 between local[4] and
    local[8] under the plain-double form).  Magnitudes stay far inside
    2^53: |ratio|*1e9 <= ~2e10, dc is a per-doc bucket count.
    """
    from .dedup import _h60
    from .textstats import ngrams_sql

    def feats(df: DataFrame, tcol: str, *ids: str) -> DataFrame:
        both = (
            f"concat(regexp_extract_all({tcol}, '\\\\S+', 0), {ngrams_sql(tcol, 2)})"
        )
        return df.select(
            *ids, F.explode(F.expr(both)).alias("_f")
        ).select(*ids, F.expr(f"pmod({_h60('_f')}, {n_buckets})").alias("_b"))

    def lm(counts: DataFrame) -> DataFrame:
        # (bucket, ln p) with add-k smoothing over the FULL bucket space;
        # the normalizer is a 1-row broadcast (the established pattern)
        tot = counts.agg(F.sum("_c").alias("_N"))
        return counts.crossJoin(F.broadcast(tot)).select(
            "_b",
            F.log(
                (F.col("_c") + F.lit(k))
                / (F.col("_N") + F.lit(k) * F.lit(float(n_buckets)))
            ).alias("_lp"),
            "_N",
        )

    t_lm = lm(
        feats(target, target_text_col).groupBy("_b").agg(F.count(F.lit(1)).alias("_c"))
    )
    # ONE pass over the corpus: the (id, bucket) counts feed BOTH the
    # raw-corpus LM (sum of _dc per bucket == the feature count per
    # bucket) and the per-doc scoring join — checkpointed because two
    # consumers would otherwise re-run the explode + md5 hashing per
    # reference (CLAUDE.md shared-subtree rule; r6 ADVICE caught the
    # double scan)
    doc_b = (
        feats(docs, text_col, id_col)
        .groupBy(id_col, "_b")
        .agg(F.count(F.lit(1)).alias("_dc"))
        .localCheckpoint(eager=False)
    )
    r_lm = lm(doc_b.groupBy("_b").agg(F.sum("_dc").alias("_c")))
    # absent buckets still carry the smoothed floor k/(N + k*m); attach
    # each LM's N so the floor is computable after the LEFT join
    t_n = t_lm.agg(F.max("_N").alias("_tN"))
    lp_t = F.coalesce(
        F.col("_lp"),
        F.log(F.lit(k) / (F.col("_tN") + F.lit(k) * F.lit(float(n_buckets)))),
    )
    ratio_nano = F.floor((lp_t - F.col("_rlp")) * 1e9 + F.lit(0.5)).cast("bigint")
    scored = (
        doc_b.join(F.broadcast(t_lm.select("_b", "_lp")), "_b", "left")
        .crossJoin(F.broadcast(t_n))
        .join(
            F.broadcast(r_lm.select("_b", F.col("_lp").alias("_rlp"))), "_b"
        )
        .groupBy(id_col)
        .agg(
            F.sum("_dc").alias("n_features"),
            F.sum(F.col("_dc") * ratio_nano).alias("_lw_nano"),
        )
    )
    lw = F.col("_lw_nano") / 1e9
    out = scored.select(
        id_col,
        "n_features",
        (F.floor(lw * 1e6 + F.lit(0.5)) / 1e6).alias("log_weight"),
        (
            F.floor(lw / F.col("n_features") * 1e6 + F.lit(0.5)) / 1e6
        ).alias("log_weight_per_feat"),
    )
    return docs.select(id_col).join(out, id_col, "left").select(
        id_col,
        F.coalesce("n_features", F.lit(0)).alias("n_features"),
        "log_weight",
        "log_weight_per_feat",
    )


def doremi_weights(
    docs: DataFrame,
    text_col: str = "text",
    domain_col: str = "source",
    n_rounds: int = 5,
    eta: float = 1.0,
    smoothing: float = 1e-3,
    k: float = 0.5,
    max_excess: float = 2.0,
) -> DataFrame:
    """DoReMi domain reweighting (Xie et al. 2023, "DoReMi: Optimizing
    Data Mixtures Speeds Up Language Model Pretraining"): the Group-DRO
    multiplicative-weights update that up-weights training domains with
    high EXCESS loss.  The paper's proxy/reference models are stood in
    for by the deterministic device this repo already uses for quality
    scoring: per-domain cross-entropy under the corpus's own add-k
    unigram LM, with the corpus-wide mean CE as the reference; excess_i
    = clamp(CE_i - CE_ref, 0, max_excess) (DoReMi clips at 0; the upper
    clamp bounds the integer trajectory).

    Update, n_rounds times from uniform:
        w'_i  = w_i * exp(eta * excess_i)         (multiplicative step)
        w''_i = w'_i / sum_j w'_j                 (normalize)
        w_i   = (1-smoothing) * w''_i + smoothing / n_domains

    Returns (domain_col, n_tokens, excess_ce, weight) — the final
    sampling mixture for composing the training corpus.

    100 TB shape: the only corpus-sized work is the per-domain CE (one
    (domain, term) hash agg, a term-keyed join against the open-vocab
    LM — deliberately NOT broadcast — and one domain agg); the n_rounds
    iteration runs on the DOMAIN dimension (tens of rows, like the
    paper's 22 Pile domains) via per-round broadcast normalizers.

    Exactness: per-term ln p is floor-quantized to nano-units once
    (the dsir_weights device), every CE/excess is a BIGINT, the single
    exp() per domain is floor-quantized to micro-units, and the whole
    n_rounds trajectory is integer micro-unit arithmetic (floor
    divisions on positives match DuckDB `//`) — summation-order
    independent, so the mixture is bit-identical at any parallelism.
    Magnitude guard: boost <= e^(eta*max_excess) micro = 7.4e6, so
    raw*1e6 <= 1e6 * 7.4e6 * 1e6 = 7.4e18 < 2^63.
    """
    c_micro = int(smoothing * 1e6)
    max_excess_nano = int(max_excess * 1e9)
    toks = docs.select(
        F.col(domain_col).alias("_dom"),
        F.explode(F.split(F.col(text_col), "\\s+")).alias("_t"),
    ).where(F.col("_t") != "")
    dc = toks.groupBy("_dom", "_t").agg(F.count(F.lit(1)).alias("_c"))
    lm = dc.groupBy("_t").agg(F.sum("_c").alias("_tc"))
    nv = lm.agg(F.sum("_tc").alias("_N"), F.count(F.lit(1)).alias("_V"))
    lp = lm.crossJoin(F.broadcast(nv)).select(
        "_t",
        F.floor(
            F.log((F.col("_tc") + k) / (F.col("_N") + k * F.col("_V"))) * 1e9
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("_lp_nano"),
    )
    dnum = (
        dc.join(lp, "_t")
        .groupBy("_dom")
        .agg(
            F.sum("_c").alias("n_tokens"),
            (-F.sum(F.col("_c") * F.col("_lp_nano"))).alias("_num"),
        )
    )
    ref = dnum.agg(
        F.expr("sum(_num) div sum(n_tokens)").alias("_ref_ce")
    )
    dom = (
        dnum.crossJoin(F.broadcast(ref))
        .select(
            "_dom",
            "n_tokens",
            F.least(
                F.greatest(
                    F.expr("_num div n_tokens") - F.col("_ref_ce"), F.lit(0)
                ),
                F.lit(max_excess_nano),
            ).alias("_exc_nano"),
        )
        .withColumn(
            "_boost",
            F.floor(F.exp(F.lit(eta) * (F.col("_exc_nano") / F.lit(1e9))) * 1e6 + F.lit(0.5)).cast(
                "bigint"
            ),
        )
    )
    nd = dom.agg(F.count(F.lit(1)).alias("_nd"))
    # checkpoint the domain frame BEFORE the loop (it holds the whole
    # corpus-CE subtree) and per round: each round references dom twice
    # (normalizer agg + crossJoin), which would otherwise double the
    # plan — and re-run the corpus scan — per iteration (CLAUDE.md
    # shared-subtree rule; caught by plan audit, 146 Exchanges at 2
    # rounds before, linear after)
    dom = (
        dom.crossJoin(F.broadcast(nd))
        .withColumn("_w", F.expr("1000000L div _nd"))
        .localCheckpoint(eager=False)
    )
    for _ in range(n_rounds):
        dom = dom.withColumn("_raw", F.col("_w") * F.col("_boost"))
        s = dom.agg(F.sum("_raw").alias("_S"))
        dom = (
            dom.crossJoin(F.broadcast(s))
            .withColumn(
                "_w",
                F.expr(
                    f"(({1000000 - c_micro}L * ((_raw * 1000000L) div _S))"
                    f" div 1000000L) + ({c_micro}L div _nd)"
                ),
            )
            .drop("_raw", "_S")
            .localCheckpoint(eager=False)
        )
    return dom.select(
        F.col("_dom").alias(domain_col),
        "n_tokens",
        ((F.expr("_exc_nano div 1000L")) / F.lit(1e6)).alias("excess_ce"),
        (F.col("_w") / F.lit(1e6)).alias("weight"),
    )
