#!/usr/bin/env python
"""Audit render-type compatibility between every Spark query and its DuckDB
oracle, WITHOUT materializing results.

The driver's correctness gate stringifies pandas-materialized values before
hashing, so types that fetchall() value comparison sees as equal can still
hash-mismatch: DuckDB sum(BIGINT) returns HUGEINT, which pandas renders as
float64 ("2000.0") while Spark's BIGINT renders "2000" (the round-3
pack_shards red row).  This script compares the *analyzed* Spark schema
(no job run for lazy plans) against DuckDB's relation types for all
oracled queries and flags any column whose render class differs.

Usage:  python scripts/audit_oracle_types.py [sf_dir]
Exit status 1 if any mismatch is found.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from nlp_cube_spark.session import get_spark  # noqa: E402


def render_class(t: str) -> str:
    t = str(t).lower()
    if t.startswith("decimal") or t in ("hugeint", "uhugeint", "float", "double", "real"):
        return "float"
    if t in ("tinyint", "smallint", "integer", "int", "bigint", "long",
             "short", "byte", "utinyint", "usmallint", "uinteger", "ubigint"):
        return "int"
    if t in ("varchar", "string"):
        return "str"
    if t in ("blob", "binary"):
        return "bytes"
    if t.startswith("timestamp"):
        return "timestamp"
    if t in ("boolean", "bool"):
        return "bool"
    if t.endswith("[]") or t.startswith("array"):
        return "list"
    if t.startswith(("map", "struct")):
        return "nested"
    return t


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="audit-oracle-types")
    con = duckdb.connect()
    for t in E.TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    oracles = E.oracle_sql()
    qs = E.queries()
    bad = []
    for name in qs:
        if name not in oracles:
            continue
        sdf = qs[name](spark, sf)
        rel = con.sql(oracles[name])
        stypes = {f.name: (f.dataType.simpleString(), render_class(f.dataType.simpleString()))
                  for f in sdf.schema.fields}
        dtypes = {c: (str(t), render_class(str(t))) for c, t in zip(rel.columns, rel.types)}
        for col in sorted(set(stypes) | set(dtypes)):
            s = stypes.get(col, ("<missing>", "<missing>"))
            d = dtypes.get(col, ("<missing>", "<missing>"))
            if s[1] != d[1]:
                bad.append((name, col, s[0], d[0]))
                print(f"MISMATCH {name}.{col}: spark={s[0]} ({s[1]}) vs duckdb={d[0]} ({d[1]})")
    print(f"audited {len(oracles)} oracled queries: {len(bad)} render-type mismatches")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
