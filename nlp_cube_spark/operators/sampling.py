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

from pyspark.sql import DataFrame, functions as F

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
