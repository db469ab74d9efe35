#!/usr/bin/env python
"""Skew stress for the graph-analytics family (r6 verdict item 7).

Runs k_core / k_truss / label_propagation / hits / pagerank /
triangle_count over the deterministic Zipfian edge set
(datagen.zipf_edges: 1M edges, 100k nodes, 10 hubs of degree ~10k —
~1000x the background median) on local[$SPARK_GRAFT_CPUS or 32] with the
Spark UI enabled, and reports per operator:

  - wall seconds
  - the worst stage straggler ratio: max task executorRunTime / median,
    over completed stages with >= 8 tasks launched by that operator
    (pulled from the UI REST taskSummary endpoint)

Gate (the verdict's wording): no straggler task > 10x the stage median.
Prints one JSON line; paste the table into BENCH/r7/NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nlp_cube_spark.datagen import zipf_edges
from nlp_cube_spark.operators import graphstats as G
from nlp_cube_spark.session import get_spark


def stage_ids_since(base: str, marker: int) -> list[int]:
    stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
    return [s["stageId"] for s in stages if s["stageId"] > marker]


def worst_ratio(base: str, stage_ids: list[int]) -> tuple[float, int]:
    worst, at = 0.0, -1
    for sid in stage_ids:
        try:
            summ = json.load(
                urllib.request.urlopen(
                    f"{base}/stages/{sid}/0/taskSummary?quantiles=0.5,1.0"
                )
            )
        except Exception:
            continue  # stage with no task metrics (skipped/empty)
        med, mx = summ["executorRunTime"]
        if mx < 200:
            continue  # sub-200ms stages are scheduling noise, not skew
        ntasks = len(
            json.load(
                urllib.request.urlopen(f"{base}/stages/{sid}/0/taskList?length=5000")
            )
        )
        if ntasks < 8:
            continue
        r = mx / max(med, 1.0)
        if r > worst:
            worst, at = r, sid
    return worst, at


def main() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        app_name="graph-skew-bench",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4047"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4047/api/v1/applications/{app_id}"

    edges = zipf_edges(spark, 1_000_000).repartition(int(cpus)).localCheckpoint()
    n = edges.count()
    print(f"edges: {n}", file=sys.stderr)

    ops = {
        "k_core": lambda: G.k_core(edges, k=3).count(),
        "k_truss": lambda: G.k_truss(edges, t=3).count(),
        "label_propagation": lambda: G.label_propagation(edges, iters=2).count(),
        "hits": lambda: G.hits(edges, iters=2).count(),
        "pagerank": lambda: G.pagerank(edges, iters=2).count(),
        "triangle_count": lambda: G.triangle_count(edges).count(),
    }
    results = {}
    marker = -1
    for name, fn in ops.items():
        t0 = time.time()
        rows = fn()
        wall = time.time() - t0
        sids = stage_ids_since(base, marker)
        marker = max(sids) if sids else marker
        ratio, at = worst_ratio(base, sids)
        results[name] = {
            "wall_sec": round(wall, 2),
            "rows": rows,
            "straggler_ratio": round(ratio, 2),
            "worst_stage": at,
            "ok": ratio <= 10.0,
        }
        print(f"{name}: {wall:.2f}s rows={rows} straggler={ratio:.2f} (stage {at})",
              file=sys.stderr)
    print(json.dumps({"edges": n, "cpus": int(cpus), "ops": results}))
    return 0 if all(r["ok"] for r in results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
