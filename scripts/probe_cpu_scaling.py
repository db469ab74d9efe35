#!/usr/bin/env python
"""Bare-metal CPU-scaling probe: the host's own N->4N ceiling, no Spark.

Runs the same fixed CPU-bound kernel in 8 and then 32 concurrent
processes (multiprocessing, no shared state) and reports
efficiency = (T_8 / T_32) / 4. On ideal hardware this is 1.0; all-core
turbo droop puts the quiet ceiling on this VM at ~0.88 (round 1). Run it
next to a Spark scaling attempt to classify the window: if the BARE
probe is far below its quiet ceiling, the host is contended and the Spark
number measures the neighbors, not the engine.

    python scripts/probe_cpu_scaling.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

WORK_UNITS = 96  # total fixed work, divisible by both 8 and 32


def kernel(_: int) -> int:
    # pure-python integer churn: no BLAS, no memory bandwidth sensitivity
    s = 0
    for i in range(2_500_000):
        s = (s * 1103515245 + 12345 + i) % (1 << 31)
    return s


def run(procs: int) -> float:
    t0 = time.monotonic()
    with mp.Pool(procs) as p:
        p.map(kernel, range(WORK_UNITS), chunksize=1)
    return time.monotonic() - t0


def main() -> None:
    run(4)  # warm-up
    t8 = min(run(8) for _ in range(2))
    t32 = min(run(32) for _ in range(2))
    eff = (t8 / t32) / 4
    print(
        json.dumps(
            {
                "metric": "bare_cpu_scaling_efficiency",
                "value": round(eff, 3),
                "t_8procs_sec": round(t8, 3),
                "t_32procs_sec": round(t32, 3),
                "loadavg_at_end": os.getloadavg(),
            }
        )
    )


if __name__ == "__main__":
    main()
