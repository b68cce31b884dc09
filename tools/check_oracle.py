#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.queries vs DuckDB oracles.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [name1,name2,...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the
<sfDir> tables, and compares row counts, sorted column names, and sorted row
values (exact for ints/strings, tiny-epsilon for floats).
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(rows):
    out = []
    for row in rows:
        norm = []
        for v in row:
            if v is None:
                norm.append(None)
            elif isinstance(v, float):
                if math.isnan(v):
                    norm.append("NaN")
                elif v == 0.0 and math.copysign(1.0, v) < 0:
                    # the driver's hash distinguishes -0.0 from +0.0;
                    # so must we (round-1 d5 lesson)
                    norm.append("-0.0")
                else:
                    norm.append(round(v, 9))
            elif isinstance(v, bool):
                norm.append(int(v))
            elif hasattr(v, "isoformat"):
                norm.append(v.isoformat()[:26])
            else:
                norm.append(v)
        out.append(tuple(norm))
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only is not None:
        unknown = only - set(oracle)
        if unknown:
            # a typo'd name would otherwise read as "0 ok, 0 fail" = pass
            print(f"FAIL unknown query names in subset: {', '.join(sorted(unknown))}")
            return 1
    ok = fail = skipped = 0
    for name, sql in sorted(oracle.items()):
        if only is not None and name not in only:
            # explicit subset (mirrors Verify's third arg); outside the
            # subset = skip. Within it — or in a full run — a missing
            # dump still FAILS below: a query that errored wrote nothing.
            skipped += 1
            continue
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = normalize(
                con.sql(
                    f"SELECT {', '.join(repr_col(c) for c in spark_cols)} FROM "
                    f"read_parquet('{out_dir}/{name}/*.parquet')").fetchall())
            duck_rel = con.sql(sql)
            duck_cols = sorted(duck_rel.columns)
            duck_rows = normalize(
                con.sql(
                    f"SELECT {', '.join(repr_col(c) for c in duck_cols)} "
                    f"FROM ({sql})").fetchall())
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            fail += 1
            continue
        if spark_cols != duck_cols:
            print(f"FAIL {name}: columns {spark_cols} != {duck_cols}")
            fail += 1
        elif len(spark_rows) != len(duck_rows):
            print(f"FAIL {name}: rows {len(spark_rows)} != {len(duck_rows)}")
            fail += 1
        elif spark_rows != duck_rows:
            diff = [(a, b) for a, b in zip(spark_rows, duck_rows) if a != b]
            print(f"FAIL {name}: {len(diff)} differing rows; first: {diff[0]}")
            fail += 1
        else:
            print(f"OK   {name} ({len(spark_rows)} rows)")
            ok += 1
    note = f", {skipped} not in this subset" if skipped else ""
    print(f"\n{ok} ok, {fail} fail{note}")
    return 1 if fail else 0


def repr_col(c):
    return '"' + c.replace('"', '""') + '"'


if __name__ == "__main__":
    names = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], names))
