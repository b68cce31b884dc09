#!/usr/bin/env python3
"""Type-level oracle audit — the check value-level compare can't do.

The round driver's hash distinguishes arrow types (the d35 lesson:
DuckDB sum(BIGINT) returns HUGEINT, propagates through least/greatest,
and a value-identical result still hash-mismatches). This audit runs
every oracle with LIMIT 0 and diffs its arrow schema against the
Spark-written parquet schema from a graft.Verify dump, so a latent
type drift is caught before the driver's gate sees it.

Usage: python3 tools/type_audit.py <sfDir> <verifyOutDir> [name1,name2,...]
With a subset list, only those queries are audited (absent dumps for
queries outside the subset are skipped, not counted as mismatches).
Exit code 1 on any mismatch.
"""
import glob
import json
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf, out, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    if only is not None:
        unknown = only - set(oracle)
        if unknown:
            print(f"FAIL unknown query names in subset: {', '.join(sorted(unknown))}")
            return 1
    mism = []
    audited = 0
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            continue
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            # full run: every dump must exist. Subset run: only requested
            # names are required (the loop already filtered to the subset).
            mism.append((name, "NO PARQUET", "verify dump missing"))
            continue
        audited += 1
        spark_schema = {f.name: str(f.type) for f in pq.read_schema(files[0])}
        try:
            duck = con.execute(f"SELECT * FROM ({sql}) LIMIT 0").arrow()
        except Exception as e:  # noqa: BLE001 - report, don't crash the audit
            mism.append((name, "ORACLE ERROR", str(e)[:160]))
            continue
        duck_schema = {f.name: str(f.type) for f in duck.schema}
        if set(duck_schema) != set(spark_schema):
            mism.append((name, "COLS",
                         f"spark={sorted(spark_schema)} duck={sorted(duck_schema)}"))
            continue
        for c in sorted(spark_schema):
            if spark_schema[c] != duck_schema[c]:
                mism.append((name, c, f"spark={spark_schema[c]} duck={duck_schema[c]}"))
    for m in mism:
        print(" | ".join(m))
    print(f"{len(mism)} mismatches across {audited} audited")
    return 1 if mism else 0


if __name__ == "__main__":
    subset = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], subset))
