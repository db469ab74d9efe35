#!/usr/bin/env python
"""Quiet-window bench hunter for the r8 optimization round.

Probes the bare-CPU ceiling every INTERVAL seconds; when a probe clears
GATE, fires one frozen-bench.py run at sf1.0 and logs the JSON line with
the probe stamp. Stops after N_GOOD quiet-window samples or --hours.

    python scripts/bench_watcher_r08.py [--hours 4] [--interval 150]
        [--gate 0.85] [--n-good 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "BENCH", "r8_watcher.log")


def log(msg: str) -> None:
    line = f"{time.strftime('%H:%M:%S', time.gmtime())} {msg}"
    print(line, flush=True)
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def probe() -> float:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "probe_cpu_scaling.py")],
        capture_output=True, text=True, timeout=300,
    )
    return float(json.loads(out.stdout.strip().splitlines()[-1])["value"])


def bench() -> dict | None:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf1.0", SPARK_GRAFT_CPUS="32")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except Exception:
            continue
    return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hours", type=float, default=4.0)
    ap.add_argument("--interval", type=int, default=150)
    ap.add_argument("--gate", type=float, default=0.85)
    ap.add_argument("--n-good", type=int, default=2)
    args = ap.parse_args()
    deadline = time.time() + args.hours * 3600
    good = 0
    while time.time() < deadline and good < args.n_good:
        try:
            p = probe()
        except Exception as e:
            log(f"probe failed: {e}")
            time.sleep(args.interval)
            continue
        if p < args.gate:
            log(f"probe {p:.3f} < {args.gate} — waiting")
            time.sleep(args.interval)
            continue
        log(f"probe {p:.3f} >= {args.gate} — firing bench")
        r = bench()
        if r:
            good += 1
            log(f"QUIET SAMPLE {good}: probe={p:.3f} total={r['value']} queries={json.dumps(r['queries'])}")
        else:
            log("bench produced no JSON")
    log(f"done: {good} quiet samples")


if __name__ == "__main__":
    main()
