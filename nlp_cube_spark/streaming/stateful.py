"""Custom stateful streaming operator via applyInPandasWithState.

Cross-batch, per-key state the built-in operators can't express
(SURVEY.md §2d "custom stateful operators"): here, first-seen URL
admission with a mutable per-key count — a crawl frontier's "have I ever
emitted this url?" check that survives across micro-batches (unlike
`dropDuplicates`, whose state the watermark evicts, this keeps an explicit
count and lets policy evolve per key).

State layout: one row per url group holding (n_seen). Output: only the
first occurrence in each url's lifetime, annotated with n_seen at emit
time (always 1) — later batches update state silently.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = "n_seen LONG"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def _first_seen(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (url,) = key
    rows = pd.concat(list(pdfs), ignore_index=True)
    seen = state.get[0] if state.exists else 0
    if seen == 0 and len(rows) > 0:
        first = rows.iloc[[0]][["text", "lang"]].copy()
        first.insert(0, "url", url)
        first["n_seen"] = 1
        yield first
    state.update((seen + len(rows),))


def first_seen_urls(pages_stream: DataFrame) -> DataFrame:
    """streaming pages -> first-ever occurrence per url (stateful)."""
    return (
        pages_stream.select("url", "text", "lang")
        .groupBy("url")
        .applyInPandasWithState(
            _first_seen,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
