"""Deterministic sampling, splits, and shard packing for training-data prep.

Every operator here is HASH-based, never RNG-based: `df.sample`/`sampleBy`
draw from a per-partition RNG stream, so their output changes under
repartitioning, AQE, and retries — unacceptable for reproducible training
mixes and impossible to oracle. md5-derived hashing gives the same sample
on any cluster layout AND lets DuckDB replay it bit-for-bit.

- `hash_sample`: keep a deterministic `fraction` of rows keyed on id.
- `stratified_hash_sample`: per-stratum fractions (language/source mixing —
  the training-mix operator).
- `hash_split`: disjoint train/val/test assignment from the same hash, so
  splits are stable forever and never leak across re-runs.
- `pack_by_budget`: group documents into ~budget-token shards in a stable
  order — the "pack examples into training shards" step. Two-phase global
  cumulative sum (range partition + per-partition cumsum + broadcast
  offsets): no single-task global window at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

H60 = "cast(conv(substr(md5({x}), 1, 15), 16, 10) as bigint)"
_BUCKETS = 1_000_000


def _hash_bucket(key: str, salt: str = "") -> F.Column:
    return F.expr(H60.format(x=f"concat(cast({key} as string), '{salt}')")) % _BUCKETS


def hash_sample(df: DataFrame, key: str, fraction: float, salt: str = "") -> DataFrame:
    """Deterministic ~fraction sample keyed on `key` (content-derived:
    stable under any partitioning/retry; same rows on every engine)."""
    return df.where(_hash_bucket(key, salt) < int(fraction * _BUCKETS))


def stratified_hash_sample(
    df: DataFrame, strata_col: str, fractions: dict[str, float], key: str,
    default: float = 0.0, salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (training-mix ratios)."""
    thresh = F.lit(int(default * _BUCKETS))
    for stratum, frac in sorted(fractions.items()):
        thresh = F.when(F.col(strata_col) == stratum, F.lit(int(frac * _BUCKETS))).otherwise(thresh)
    return df.where(_hash_bucket(key, salt) < thresh)


def hash_split(
    df: DataFrame, key: str, weights: dict[str, float], out_col: str = "split",
    salt: str = "",
) -> DataFrame:
    """Disjoint deterministic splits (e.g. {'train': .9, 'val': .05,
    'test': .05}); assignment depends only on the key, so it never shifts
    when the corpus grows."""
    h = _hash_bucket(key, salt)
    expr = None
    acc = 0.0
    for name, w in sorted(weights.items()):
        acc += w
        cond = h < int(acc * _BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(out_col, expr.otherwise(sorted(weights)[-1]))


def pack_by_budget(
    df: DataFrame, size_col: str, budget: int, order_col: str = "doc_id",
    out_col: str = "shard",
) -> DataFrame:
    """Assign each row a shard id so cumulative `size_col` per shard is
    ~budget, in deterministic `order_col` order.

    shard = floor(exclusive-prefix-sum(size) / budget) — a document spans
    the boundary into the shard its prefix starts in (simple, stable, and
    replayable as one SQL window). The prefix sum is the shared
    content-derived two-phase form (operators/ranges.py): no single-task
    global sort, and — unlike the r2 repartitionByRange form — the bucket
    assignment is a pure function of row content, so it cannot drift
    between plan branches under AQE replans or retries."""
    from .ranges import exclusive_prefix_sum

    pre = exclusive_prefix_sum(df, [F.col(order_col)], size_col, out_col="_pre")
    return pre.withColumn(out_col, F.floor(F.col("_pre") / budget).cast("int")).drop("_pre")


def pack_by_budget_grouped(
    df: DataFrame, group_col: str, size_col: str, budget: int,
    order_col: str = "doc_id", out_col: str = "shard",
) -> DataFrame:
    """`pack_by_budget` applied independently per `group_col` value, in ONE
    pass: identical rows to unioning pack_by_budget over each group, but
    a single prefix-sum job instead of one count + one boundary-collect +
    one window chain PER group (3 splits = ~9 driver actions in the
    per-split loop; measured ~3.9s -> one pass at sf1.0).

    Derivation: the global exclusive prefix sum over (group, order) minus
    the total size of all PRECEDING groups (a #groups-row broadcast
    dimension) is exactly the group-local exclusive prefix sum — all
    integer arithmetic, so equality with the per-group form is exact,
    not approximate. shard = floor(group_local_prefix / budget)."""
    from .ranges import exclusive_prefix_sum

    pre = exclusive_prefix_sum(
        df, [F.col(group_col), F.col(order_col)], size_col, out_col="_pre"
    )
    totals = df.groupBy(group_col).agg(F.sum(size_col).alias("_gn"))
    w = Window.orderBy(group_col).rowsBetween(Window.unboundedPreceding, -1)
    goff = totals.withColumn("_goff", F.coalesce(F.sum("_gn").over(w), F.lit(0))).select(
        group_col, "_goff"
    )
    return (
        pre.join(F.broadcast(goff), group_col)
        .withColumn(out_col, F.floor((F.col("_pre") - F.col("_goff")) / budget).cast("int"))
        .drop("_pre", "_goff")
    )


def passage_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Sliding token-window passage chunking — the context-window prep
    step for embedding/RAG pipelines (public pattern; the engine's own
    segmenter uses the same 300/100 device inside the annotate stage,
    kernels/segment_rules.py:76-94 — this is its standalone relational
    form over raw documents).

    Chunk k covers tokens [k*stride+1 .. k*stride+size] (1-based,
    truncated at the doc tail); starts are every `stride` tokens while
    they fall inside the doc, so consecutive chunks overlap by
    size-stride tokens. Returns (id_col, chunk_id, start_token,
    n_tokens, passage); empty docs yield no rows.

    Plan shape: per-doc array transform + explode — linear in tokens
    with the size/stride overlap factor, shuffle-free (no window, no
    join; chunking needs contiguous slices, which the regex n-gram
    trick cannot produce, so the interpreted-HOF tax is accepted here
    and documented — cf. the measurement in ngrams_sql). The sequence()
    upper bound is guarded against Spark's descending sequence(1, 0)
    pitfall (CLAUDE.md)."""
    if size < 1 or stride < 1:
        raise ValueError("passage_chunks: size and stride must be >= 1")
    toks = f"filter(split(trim({text_col}), '\\\\s+'), t -> t != '')"
    chunks = F.expr(
        f"case when size({toks}) = 0 then array() "
        f"else transform(sequence(0, (size({toks}) - 1) div {stride}),"
        f" k -> slice({toks}, k * {stride} + 1, {size})) end"
    )
    return docs.select(F.col(id_col), F.posexplode(chunks).alias("chunk_id", "_ct")).select(
        id_col,
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        (F.col("chunk_id") * stride + 1).cast("bigint").alias("start_token"),
        F.size("_ct").cast("bigint").alias("n_tokens"),
        F.array_join("_ct", " ").alias("passage"),
    )


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    2006, public knowledge): rank by key = u^(1/w) and keep the top k —
    inclusion probability proportional to weight, exactly one pass.

    Deterministic like everything in this module: u is NOT an RNG draw
    but an exact 52-bit uniform derived from md5(id) ((h52+1)/2^52 —
    13 hex chars = 52 bits, exactly representable in a double, so u is
    bit-identical on any engine). Ranking uses the monotone transform
    ln(u)/w (avoids pow underflow at large weights), ROUNDED 9dp before
    the comparison so a ulp never decides membership at the k-th
    boundary (the term_scores rank discipline); ties break on id.
    Non-positive or NULL weights are excluded (ln(u)<0 divided by w<=0
    would flip the ordering, not sample it).

    Returns the k sampled rows as (id_col, weight, es_key). Plan:
    per-row expressions + global top-k = TakeOrderedAndProject (per-
    partition heap + k-row driver merge), no global sort."""
    if k < 1:
        raise ValueError("weighted_sample: k must be >= 1")
    h = F.expr(f"cast(conv(substr(md5(cast({id_col} as string)), 1, 13), 16, 10) as bigint)")
    u = (h + 1) / F.lit(float(1 << 52))
    key = F.round(F.log(u) / F.col(weight_col).cast("double"), 9)
    return (
        docs.where(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .select(F.col(id_col), F.col(weight_col).alias("weight"), key.alias("es_key"))
        .orderBy(F.desc("es_key"), F.asc(id_col))
        .limit(k)
    )
