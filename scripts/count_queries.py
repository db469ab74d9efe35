#!/usr/bin/env python
"""Count the driver-query registry so COVERAGE.md can't drift again.

Prints the registry size, the oracle count, and the first-50 window
composition, and exits non-zero if COVERAGE.md states a different
total than the registry holds (the r5 verdict caught exactly this:
doc said 72, registry held 74).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E  # noqa: E402


def main() -> int:
    n_queries = len(E._QUERIES)
    n_oracles = len(E.oracle_sql())
    window = list(E._QUERIES)[:50]
    print(f"registered queries: {n_queries}")
    print(f"oracled queries:    {n_oracles}")
    missing = [k for k in E._QUERIES if k not in E.oracle_sql()]
    if missing:
        print(f"queries WITHOUT an oracle: {missing}")
    print(f"driver window (first 50): {window}")

    cov = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
    with open(cov) as f:
        text = f.read()
    stated = re.findall(r"(\d+) oracled queries", text)
    bad = [s for s in stated if int(s) != n_oracles]
    if bad:
        print(f"COVERAGE.md says {bad} oracled queries but registry has {n_oracles} — fix the doc")
        return 1
    print("COVERAGE.md totals match the registry")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
