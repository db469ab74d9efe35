"""Deterministic range bucketing + distributed global prefix sums.

Why not `repartitionByRange`: its range boundaries come from a reservoir
sample seeded by RDD id, and when one ranged exchange feeds TWO plan
branches (the per-partition window AND the partition-size offsets dim, as
pack_by_budget/vocab._rank_ids did in round 2), an AQE replan or stage
retry can re-execute the exchange with different boundaries — the
`spark_partition_id()` seen by one branch then no longer corresponds to
the offsets computed by the other, which is exactly a sporadic
wrong-answer (the r2 pack_shards hash mismatch). This module removes the
hazard at the root: the bucket id is a PURE FUNCTION OF ROW CONTENT
(driver-picked boundaries from a deterministic content-hash sample), so
any recomputation of any branch assigns identical buckets.

Scale/cost model (100 TB): one column-pruned count job, one
~n_buckets*oversample-row sample-collect (the filter is a hash predicate
on the sort key, so the scan stays narrow and the collect is bounded and
driver-safe), then the same two-phase shape as before — bucket-local
window (parallel) + a #buckets-row broadcast offsets dim. Callers that
feed an expensive upstream plan should persist/localCheckpoint `df` first
so the three passes (count, sample, main) don't recompute it; for a
parquet scan the extra passes are count-only/narrow and cheap.

Correctness requirements on `sort_exprs`:
- non-null values (hash/window/compare semantics under NULL differ);
- the combined tuple must be a TOTAL order (unique) so the prefix sum is
  well-defined — both call sites satisfy this (doc_id unique; vocab key
  unique within (count, key)).
Python-side boundary sorting matches Spark's ordering because UTF-8 byte
order preserves codepoint order and numerics compare identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_HASH_MOD = 1_000_000


def _lex_lt(exprs: list[Column], vals: tuple) -> Column:
    """Lexicographic `(e0, e1, ...) < (v0, v1, ...)` as a Catalyst predicate
    (struct-literal comparison avoided: field-name/type coercion is fragile
    across Spark versions; this is plain comparisons + booleans)."""
    cond = F.lit(False)
    for e, v in reversed(list(zip(exprs, vals))):
        cond = (e < F.lit(v)) | ((e == F.lit(v)) & cond)
    return cond


def content_range_boundaries(
    df: DataFrame, sort_exprs: list[Column], n_buckets: int, oversample: int = 64
) -> list[tuple]:
    """Ascending boundary tuples splitting the sort-key space into at most
    `n_buckets` ranges, computed from a DETERMINISTIC sample: rows kept by a
    hash predicate on the sort key itself (content-derived — identical on
    every rerun, partitioning, and engine), then quantiled on the driver."""
    n = df.count()
    if n == 0 or n_buckets <= 1:
        return []
    k = min(n_buckets, n)
    sel = df.select(*[e.alias(f"_c{i}") for i, e in enumerate(sort_exprs)])
    target = k * oversample
    if n > target:
        thr = max(1, (_HASH_MOD * target) // n)
        keys = [F.col(f"_c{i}") for i in range(len(sort_exprs))]
        sel = sel.where(F.pmod(F.xxhash64(*keys), F.lit(_HASH_MOD)) < F.lit(thr))
    sample = sorted(tuple(r) for r in sel.collect())
    if not sample:
        return []
    bnds: list[tuple] = []
    m = len(sample)
    for j in range(1, k):
        b = sample[(j * m) // k]
        if not bnds or b > bnds[-1]:
            bnds.append(b)
    return bnds


def with_range_pid(
    df: DataFrame, sort_exprs: list[Column], n_buckets: int = 32,
    pid_col: str = "_pid", oversample: int = 64,
) -> DataFrame:
    """Add `pid_col`: a bucket id monotone non-decreasing in sort order and
    derived ONLY from row content (the deterministic repartitionByRange
    replacement). Bucket sizes are ~n/n_buckets by construction of the
    sampled quantile boundaries (skew-bounded)."""
    bnds = content_range_boundaries(df, sort_exprs, n_buckets, oversample)
    if not bnds:
        return df.withColumn(pid_col, F.lit(0))
    expr = None
    for i, b in enumerate(bnds):
        c = _lex_lt(sort_exprs, b)
        expr = F.when(c, i) if expr is None else expr.when(c, i)
    return df.withColumn(pid_col, expr.otherwise(len(bnds)))


def exclusive_prefix_sum(
    df: DataFrame, sort_exprs: list[Column], value, out_col: str = "_pre",
    n_buckets: int = 32,
) -> DataFrame:
    """Global exclusive prefix sum of `value` in `sort_exprs` order WITHOUT
    a single-task global sort: content-derived range buckets (parallel
    bucket-local window) + a #buckets-row broadcast offsets dim. The result
    is identical to `sum(value) OVER (ORDER BY sort ROWS UNBOUNDED
    PRECEDING TO 1 PRECEDING)` and — unlike the repartitionByRange form —
    deterministic under AQE replans, retries, and any shuffle-partition
    setting, because bucket ids never depend on physical partition identity.
    """
    pid = "_epz_pid"
    bucketed = with_range_pid(df, sort_exprs, n_buckets, pid_col=pid)
    w_local = Window.partitionBy(pid).orderBy(*sort_exprs).rowsBetween(
        Window.unboundedPreceding, -1
    )
    local = bucketed.withColumn(out_col, F.coalesce(F.sum(value).over(w_local), F.lit(0)))
    sizes = bucketed.groupBy(pid).agg(F.sum(value).alias("_n"))
    w_cum = Window.orderBy(pid).rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.withColumn(
        "_off", F.coalesce(F.sum("_n").over(w_cum), F.lit(0))
    ).select(pid, "_off")
    return (
        local.join(F.broadcast(offsets), pid)
        .withColumn(out_col, F.col(out_col) + F.col("_off"))
        .drop(pid, "_off")
    )
