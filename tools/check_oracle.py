#!/usr/bin/env python3
"""Local pre-verification of SparkEntry.oracleSql vs the Spark results.

Mimics the driver's t2 gate: run graft.Verify first (dumps each query's
result to <outdir>/<name>/ parquet + oracle_sql.json), then this script
runs every oracle SQL in DuckDB over the same testdata parquet and
compares values exactly (columns sorted by name, rows as multisets and
in declared order).

Usage: python3 tools/check_oracle.py <sfdir> <outdir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # exact double repr — bitwise compare
    return repr(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(norm_cell(r[i]) for i in order) for r in rows]


def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.loads(Path(outdir, "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            otypes = [str(d[1]) for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        try:
            sres = con.execute(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')")
            scols = [d[0] for d in sres.description]
            stypes = [str(d[1]) for d in sres.description]
            srows = sres.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {e}")
            n_fail += 1
            continue
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: columns differ oracle={sorted(ocols)} spark={sorted(scols)}")
            n_fail += 1
            continue
        # The driver's hash covers value *encoding*: DuckDB HUGEINT vs Spark
        # BIGINT hash differently even when repr-equal. Compare types too.
        otypemap = dict(zip(ocols, otypes))
        stypemap = dict(zip(scols, stypes))
        tdiff = {c: (otypemap[c], stypemap[c]) for c in ocols
                 if otypemap[c] != stypemap[c]}
        if tdiff:
            print(f"FAIL {name}: column types differ (oracle, spark): {tdiff}")
            n_fail += 1
            continue
        on = norm_rows(ocols, orows)
        sn = norm_rows(scols, srows)
        if on == sn:
            n_pass += 1
            print(f"PASS {name} ({len(on)} rows)")
        elif sorted(on) == sorted(sn):
            n_pass += 1
            print(f"PASS {name} ({len(on)} rows; row order differs)")
        else:
            n_fail += 1
            print(f"FAIL {name}: values differ ({len(on)} oracle vs {len(sn)} spark rows)")
            oset, sset = set(on), set(sn)
            for r in list(oset - sset)[:3]:
                print(f"  oracle-only: {r}")
            for r in list(sset - oset)[:3]:
                print(f"  spark-only:  {r}")
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
