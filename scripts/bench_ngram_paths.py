#!/usr/bin/env python
"""Measure the interpreted-HOF tax in ngrams_sql (VERDICT r5 item 6).

Spark HOF lambdas (transform/filter/slice) are interpreted, never
codegen'd (CLAUDE.md: ~5 JVM-core-ms/doc measured). decontaminate and
repetition_stats build their gram arrays through them. Candidates:

  hof      — current: filter(split) + transform(sequence)+slice+array_join
  regex    — whitespace-normalize then ONE lookahead regexp_extract_all
             (overlapping matches captured by a (?=(...)) group): pure
             JVM regex inside codegen, no lambdas, no extra shuffle
  window   — split + posexplode + row_number + lead()s: codegen'd but
             adds a token-volume shuffle+sort per doc

Each path feeds the same explode -> groupBy(id, gram) count (the
repetition_stats shape). Prints one JSON line; also asserts all paths
produce IDENTICAL gram multisets on a sample first (so flipping the
implementation cannot move any oracle hash).

    python scripts/bench_ngram_paths.py [--mult 20] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window, functions as F

from nlp_cube_spark.session import get_spark

N = 13  # the decontaminate default — the expensive case


def grams_hof(docs: DataFrame, n: int) -> DataFrame:
    toks = "filter(split(text, '\\\\s+'), t -> t <> '')"
    expr = (
        f"case when size({toks}) >= {n} then "
        f"transform(sequence(1, size({toks}) - {n} + 1), "
        f"i -> array_join(slice({toks}, i, {n}), ' ')) "
        "else array() end"
    )
    return docs.select("doc_id", F.explode(F.expr(expr)).alias("gram"))


def grams_regex(docs: DataFrame, n: int) -> DataFrame:
    # one match per TOKEN START: the lookahead captures the n-gram, the
    # consumed \S+ advances the scan past the current token (a bare
    # lookahead would also fire at every position INSIDE a token)
    tail = " \\\\S+" * (n - 1)
    expr = (
        "regexp_extract_all(regexp_replace(trim(text), '\\\\s+', ' '), "
        f"'(?=(\\\\S+{tail}))\\\\S+', 1)"
    )
    return docs.select("doc_id", F.explode(F.expr(expr)).alias("gram"))


def grams_window(docs: DataFrame, n: int) -> DataFrame:
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", "\\s+")).alias("pos", "tok")
    ).where(F.col("tok") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    cols = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
    out = toks.select("doc_id", F.concat_ws(" ", *cols).alias("gram"), F.lead("tok", n - 1).over(w).alias("__last"))
    return out.where(F.col("__last").isNotNull()).select("doc_id", "gram")


PATHS = {"hof": grams_hof, "regex": grams_regex, "window": grams_window}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=20)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-ngrams", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")

    # parity gate on the real table before any timing
    sample = docs.limit(400).localCheckpoint()
    ref = None
    for name, fn in PATHS.items():
        got = sorted(
            tuple(r) for r in fn(sample, N).groupBy("doc_id", "gram").count().collect()
        )
        if ref is None:
            ref = got
        assert got == ref, f"{name} diverges from hof on the sample"
    print("parity: all 3 paths identical on 400-doc sample", file=sys.stderr)

    big = docs.crossJoin(
        spark.range(args.mult).select(F.col("id").alias("rep"))
    ).select(
        F.concat_ws("#", "doc_id", "rep").alias("doc_id"), "text"
    ).repartition(64).localCheckpoint()
    n_docs = big.count()

    timings = {}
    for name, fn in PATHS.items():
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.time()
            fn(big, N).groupBy("doc_id", "gram").count().write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
    print(json.dumps({"metric": "ngram_path_sec", "n": N, "n_docs": n_docs, **timings}))
    spark.stop()


if __name__ == "__main__":
    main()
