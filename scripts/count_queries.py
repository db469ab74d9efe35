#!/usr/bin/env python
"""Count the driver-query registry so COVERAGE.md can't drift again.

Prints the registry size, the oracle count, and the first-50 window
composition, and exits non-zero if COVERAGE.md disagrees with the
registry (the r5 verdict caught exactly this: doc said 72, registry
held 74).

The current-window section of COVERAGE.md is GENERATED, not
hand-maintained (r6 verdict item 8): the block between the
BEGIN/END GENERATED WINDOW markers is rewritten by

    python scripts/count_queries.py --write-window

and the default (no-flag) run fails if that block is stale, so doc ==
code is enforced by the same script that asserts the totals.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as E  # noqa: E402

BEGIN = "<!-- BEGIN GENERATED WINDOW (scripts/count_queries.py --write-window) -->"
END = "<!-- END GENERATED WINDOW -->"


def window_section() -> str:
    queries = list(E._QUERIES)
    window, below = queries[:50], queries[50:]
    no_oracle = [k for k in queries if k not in E.oracle_sql()]
    lines = [
        BEGIN,
        "",
        f"Registry: {len(queries)} registered queries, "
        f"{len(queries) - len(no_oracle)} with full DuckDB oracles"
        + (f" ({', '.join(no_oracle)} rows-only)" if no_oracle else "")
        + ". The driver checks the FIRST 50 each round; every entry is"
        " replayed locally against its oracle at two scale factors on"
        " every pytest run (tests/test_entry_queries.py).",
        "",
        "Current driver window (50, in registry order):",
        "",
    ]
    for i in range(0, len(window), 4):
        lines.append("    " + ", ".join(window[i : i + 4]))
    lines += [
        "",
        f"Below the window ({len(below)}, locally oracled, rotates forward):",
        "",
    ]
    for i in range(0, len(below), 4):
        lines.append("    " + ", ".join(below[i : i + 4]))
    lines += ["", END]
    return "\n".join(lines)


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

    cov = os.path.join(REPO, "COVERAGE.md")
    with open(cov) as f:
        text = f.read()
    stated = re.findall(r"(\d+) oracled queries", text)
    bad = [s for s in stated if int(s) != n_oracles]
    if bad:
        print(f"COVERAGE.md says {bad} oracled queries but registry has {n_oracles} — fix the doc")
        return 1

    section = window_section()
    pattern = re.compile(re.escape(BEGIN) + r".*?" + re.escape(END), re.DOTALL)
    if "--write-window" in sys.argv:
        if pattern.search(text):
            new = pattern.sub(lambda _m: section, text)
        else:
            new = text.rstrip() + "\n\n## Driver window (generated)\n\n" + section + "\n"
        with open(cov, "w") as f:
            f.write(new)
        print("COVERAGE.md window section rewritten")
        return 0
    m = pattern.search(text)
    if not m:
        print("COVERAGE.md lacks the generated window section — run --write-window")
        return 1
    if m.group(0) != section:
        print("COVERAGE.md window section is STALE — run --write-window")
        return 1
    print("COVERAGE.md totals match the registry")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
