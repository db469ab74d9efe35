"""Measure simhash64 (interpreted-HOF Catalyst) vs simhash64_arrow at
increasing document lengths, to pick the scale-safe default for web-length
documents (VERDICT r2 item 7).

The fixture docs average ~35 tokens; web documents are 10-100x longer.
Both paths hash every token occurrence (no memoization), so repeating the
fixture text N times is a faithful length proxy. Prints one JSON line per
(repeat, variant) with min-of-3 warm timings.

Run: PYTHONPATH=/root/repo python scripts/bench_simhash_lengths.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nlp_cube_spark.operators.dedup import simhash64, simhash64_arrow
from nlp_cube_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
REPEATS = [1, 10, 30, 100]
N_DOCS = 500


def main():
    spark = get_spark(app_name="simhash-length-bench")
    spark.sparkContext.setLogLevel("ERROR")
    base = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(N_DOCS)
        .select("doc_id", "text")
        .repartition(32)
        .cache()
    )
    base.count()
    # warm python workers on every task slot before timing anything
    simhash64_arrow(base, "text").agg(F.max("simhash")).collect()

    results = []
    for rep in REPEATS:
        docs = base.withColumn(
            "text", F.array_join(F.array_repeat(F.col("text"), rep), " ")
        ).cache()
        n_tokens = docs.select(F.sum(F.size(F.split("text", " "))).alias("n")).collect()[0]["n"]
        for name, fn in (("hof", simhash64), ("arrow", simhash64_arrow)):
            times = []
            for _ in range(3):
                t0 = time.monotonic()
                out = fn(docs, "text").agg(F.max("simhash").alias("s")).collect()[0]["s"]
                times.append(time.monotonic() - t0)
            rec = {
                "repeat": rep,
                "avg_tokens_per_doc": round(n_tokens / N_DOCS, 1),
                "variant": name,
                "sec": round(min(times), 3),
                "checksum": out,
            }
            results.append(rec)
            print(json.dumps(rec), flush=True)
        docs.unpersist()

    # bit-identical cross-check at the longest shape
    longest = base.withColumn("text", F.array_join(F.array_repeat(F.col("text"), REPEATS[-1]), " "))
    a = simhash64(longest, "text").select("doc_id", "simhash")
    b = simhash64_arrow(longest, "text").select("doc_id", "simhash")
    mismatches = a.join(b, "doc_id").where(a["simhash"] != b["simhash"]).count()
    print(json.dumps({"bit_identical_at_longest": mismatches == 0}))
    spark.stop()


if __name__ == "__main__":
    main()
