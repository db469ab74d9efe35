"""Sessionization: gap-based session windows over an event stream.

`F.session_window` is the Spark-native form (works identically over a
static DataFrame and a Structured Stream with a watermark — the same code
is the incremental operator a crawl/clickstream pipeline runs). Batch
semantics are the classic gaps-and-islands: consecutive events of the same
key merge while the gap to the PREVIOUS event is <= gap — the boundary is
INCLUSIVE (an event at exactly last_event + gap merges; pinned empirically
and in tests with 1799/1800/1801-second deltas) — which is what the DuckDB
oracle replays with lag() + a running island counter.

Scale shape: one shuffle keyed on (key), then per-key ordered merge —
the same cost as any window aggregation; no skew beyond the key's own
event volume (a bot user is one hot key: cap upstream or salt by day).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sessionize(
    events: DataFrame, key: str = "user_id", ts_col: str = "ts",
    gap: str = "30 minutes", agg_col: str = "value",
) -> DataFrame:
    """(key, session_start, session_end, n_events, sum_<agg_col>)."""
    sw = F.session_window(ts_col, gap)
    return (
        events.groupBy(F.col(key), sw)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(agg_col), 2).alias(f"sum_{agg_col}"),
        )
        .select(
            key,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            f"sum_{agg_col}",
        )
    )
