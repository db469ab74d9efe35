"""Distributed quality-classifier training: batch logistic regression
over hashed word features, the published recipe for corpus quality
filtering (GPT-3 appendix A trains a logistic classifier to score
CommonCrawl documents by similarity to a curated corpus; fastText-style
hashed bag-of-words features).

Spark-first shape — training IS aggregation:
  - features: one explode -> (doc, bucket, count) hash agg; the bucket
    space is FIXED (`n_buckets`), so the weight vector is a <=n_buckets
    row dimension that legitimately BROADCASTS into every join.
  - per iteration (full-batch gradient descent):
      margin   z_d = sum_b c_db * w_b + bias        (one broadcast join
                                                     + one doc agg)
      p_d      = sigmoid(z_d)
      gradient g_b = sum_d (p_d - y_d) * c_db       (one doc-keyed join
                                                     + one bucket agg)
      update   w_b <- w_b - lr * g_b / n_docs
    The corpus is scanned once per gradient; nothing wider than
    (doc, bucket) is ever shuffled; the weight table localCheckpoints
    per iteration (the kmeans/pagerank plan-bounding pattern).

Determinism discipline (stronger than round-after-sum): weights, bias,
and sigmoid outputs live as INTEGER NANO-UNITS (value * 1e9 as BIGINT).
Every gradient/margin sum is then a sum of exact integers — bit-
identical across engines AND summation orders, the lesson from
dsir_weights where a plain double sum straddled 1e-6 on partition
order.  The only float step is sigmoid itself (exp agrees to ~1 ulp
cross-engine; its 9dp rounding is the same accepted flake class as the
kmeans means).  BIGINT headroom: |p - y| * c * n_docs nano-units must
stay under 2^63 — at ~1e13-token web scale swap the two gradient sums
to decimal(38,0) (DuckDB already sums to HUGEINT).

The whole `iters`-step trajectory is replayed by the driver oracle as
an unrolled DuckDB CTE chain (_lr_train_ctes in __spark_entry__), the
same evidence style as BPE and k-means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

NANO = 1_000_000_000


def hashed_word_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """(id, bucket, count) hashed unigram counts — one explode + one
    hash agg; the md5-based 60-bit hash keeps the DuckDB oracle
    byte-compatible."""
    from .dedup import _h60

    return (
        docs.select(
            F.col(id_col),
            F.explode(F.expr(f"regexp_extract_all({text_col}, '\\\\S+', 0)")).alias(
                "_f"
            ),
        )
        .select(id_col, F.expr(f"pmod({_h60('_f')}, {n_buckets})").alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def train_quality_lr(
    docs: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    iters: int = 4,
    lr: float = 0.5,
) -> DataFrame:
    """Full-batch logistic regression; `label_col` must be 0/1.

    Returns the trained model as a DataFrame: (bucket, weight) with one
    row per feature bucket seen in the corpus plus bucket = -1 carrying
    the bias (feature buckets are pmod-nonnegative, so -1 never
    collides).  Weights are nano-unit-exact; the published `weight`
    column is weight_nano / 1e9.
    """
    feats = hashed_word_features(docs, id_col, text_col, n_buckets).localCheckpoint(
        eager=False
    )
    labels = docs.select(
        F.col(id_col), (F.col(label_col).cast("bigint") * NANO).alias("_yn")
    ).localCheckpoint(eager=False)
    n_docs = labels.groupBy().agg(F.count(F.lit(1)).alias("_n"))

    w = (
        feats.select("bucket")
        .distinct()
        .select("bucket", F.lit(0).cast("bigint").alias("_wn"))
        .localCheckpoint(eager=False)
    )
    bias = F.broadcast(
        labels.groupBy().agg(F.lit(0).cast("bigint").alias("_bn"))
    ).localCheckpoint(eager=False)

    for _ in range(iters):
        margins = (
            feats.join(F.broadcast(w), "bucket")
            .groupBy(id_col)
            .agg(F.sum(F.col("c") * F.col("_wn")).alias("_zn"))
        )
        # docs with no features still train the bias: z = 0 + bias
        p = (
            labels.join(margins, id_col, "left")
            .crossJoin(F.broadcast(bias))
            .select(
                id_col,
                "_yn",
                F.floor(
                    F.lit(1.0)
                    / (
                        F.lit(1.0)
                        + F.exp(
                            -(
                                (F.coalesce(F.col("_zn"), F.lit(0)) + F.col("_bn"))
                                / F.lit(float(NANO))
                            )
                        )
                    )
                    * NANO
                    + F.lit(0.5)
                )
                .cast("bigint")
                .alias("_pn"),
            )
            # p feeds BOTH the weight gradient and the bias gradient —
            # without a checkpoint Spark replays the margins join per
            # reference (CLAUDE.md shared-subtree rule), doubling the
            # corpus scans per iteration
            .localCheckpoint(eager=False)
        )
        grad = (
            feats.join(p, id_col)
            .groupBy("bucket")
            .agg(F.sum((F.col("_pn") - F.col("_yn")) * F.col("c")).alias("_gn"))
        )
        step = F.floor(
            F.lit(lr) * F.col("_gn") / F.col("_n") + F.lit(0.5)
        ).cast("bigint")
        w = (
            w.join(grad, "bucket", "left")
            .crossJoin(F.broadcast(n_docs))
            .select(
                "bucket",
                (F.col("_wn") - F.coalesce(step, F.lit(0))).alias("_wn"),
            )
            .localCheckpoint(eager=False)
        )
        bgrad = p.groupBy().agg(F.sum(F.col("_pn") - F.col("_yn")).alias("_gn"))
        bias = (
            bias.crossJoin(F.broadcast(bgrad))
            .crossJoin(F.broadcast(n_docs))
            # same coalesce the weight step has: on a degenerate corpus
            # (no scoreable docs) the sum aggregates to NULL and the bias
            # must stay put, not silently go NULL (r6 ADVICE)
            .select((F.col("_bn") - F.coalesce(step, F.lit(0))).alias("_bn"))
            .localCheckpoint(eager=False)
        )

    model = w.select("bucket", "_wn").unionByName(
        bias.select(F.lit(-1).alias("bucket"), F.col("_bn").alias("_wn"))
    )
    return model.select(
        "bucket", (F.col("_wn") / F.lit(float(NANO))).alias("weight")
    )


def score_quality_lr(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """Score documents under a trained model: (id, n_features, score)
    with score = sigmoid(z) floor-rounded 6dp; featureless docs score
    sigmoid(bias)."""
    feats = hashed_word_features(docs, id_col, text_col, n_buckets)
    wn = model.select(
        "bucket",
        F.floor(F.col("weight") * NANO + F.lit(0.5)).cast("bigint").alias("_wn"),
    )
    # agg (not a bare filter): always exactly one row, so a model missing
    # its bucket=-1 bias row degrades to bias 0 instead of a crossJoin
    # with an EMPTY frame silently unscoring the whole corpus
    bias = F.broadcast(
        wn.where(F.col("bucket") == -1).agg(
            F.coalesce(F.sum("_wn"), F.lit(0).cast("bigint")).alias("_bn")
        )
    )
    margins = (
        feats.join(F.broadcast(wn.where(F.col("bucket") >= 0)), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_features"),
            F.sum(F.col("c") * F.col("_wn")).alias("_zn"),
        )
    )
    return (
        docs.select(id_col)
        .join(margins, id_col, "left")
        .crossJoin(bias)
        .select(
            id_col,
            F.coalesce("n_features", F.lit(0)).alias("n_features"),
            (
                F.floor(
                    F.lit(1.0)
                    / (
                        F.lit(1.0)
                        + F.exp(
                            -(
                                (F.coalesce(F.col("_zn"), F.lit(0)) + F.col("_bn"))
                                / F.lit(float(NANO))
                            )
                        )
                    )
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("score"),
        )
    )


def calibration_bins(
    scored: DataFrame,
    label_col: str = "label",
    score_col: str = "score",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a probabilistic classifier
    (Guo et al. 2017 "On Calibration of Modern Neural Networks" — the
    standard ECE binning): equal-width score bins with observed
    positive rate vs mean predicted score. A well-calibrated quality
    filter has pos_rate ~ mean_score per bin; divergence tells you the
    LR threshold is lying about precision.

    Returns (bin, n_docs, n_pos, mean_score, pos_rate); scores are the
    engine's 6dp-quantized sigmoids, so the per-bin sum is an EXACT
    integer micro-unit sum (order-independent) and mean_score is a
    floor'd integer division — deterministic at any parallelism.
    One hash agg over the scored frame; NULL scores (featureless docs)
    are excluded.
    """
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("bigint"),
        F.lit(n_bins - 1).cast("bigint"),
    )
    smicro = F.floor(F.col(score_col) * 1e6 + F.lit(0.5)).cast("bigint")
    agg = (
        scored.where(F.col(score_col).isNotNull())
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(label_col).alias("n_pos"),
            F.sum(smicro).alias("_sm"),
        )
    )
    return agg.select(
        "bin",
        "n_docs",
        F.col("n_pos").cast("bigint").alias("n_pos"),
        (F.expr("_sm div n_docs") / F.lit(1e6)).alias("mean_score"),
        (F.col("n_pos") / F.col("n_docs")).alias("pos_rate"),
    )
