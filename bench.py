#!/usr/bin/env python
"""Benchmark: KG pipeline throughput + headline queries.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>, "docs_per_sec": ..., "triples_per_sec": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402
from nlp_cube_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "pricing_summary",
    "top_revenue_orders",
    "region_revenue",
    "window_top3",
    "events_hourly",
    "salted_supplier_counts",
    "doc_fingerprints",
    "doc_quality",
    "simhash_signatures",
    "ann_cosine_topk",
    "kg_upos_distribution",
    "kg_triples",
]


def materialize(df) -> int:
    """Force full computation (noop sink keeps all columns live)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark(app_name="nlp_cube_spark-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    qs = E.queries()
    for name in HEADLINE:
        t0 = time.time()
        materialize(qs[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    # full pipeline (annotate -> triples -> link -> canonicalize -> write)
    from nlp_cube_spark.datagen import aliases_df
    from nlp_cube_spark.plans import pipeline as P

    pages = E._docs_as_pages(spark, sf_dir)
    n_docs = pages.count()
    out = tempfile.mkdtemp(prefix="bench_kg_")
    t0 = time.time()
    m = P.build_graph(spark, pages, aliases_df(spark), out, n_buckets=int(cpus), resume=False)
    pipeline_sec = round(time.time() - t0, 3)
    shutil.rmtree(out, ignore_errors=True)
    timings["kg_build_graph"] = pipeline_sec

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "kg_pipeline_plus_headline_queries",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "n_docs": n_docs,
                "n_triples": m["n_triples"],
                "docs_per_sec": round(n_docs / pipeline_sec, 2),
                "triples_per_sec": round(m["n_triples"] / pipeline_sec, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
