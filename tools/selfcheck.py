#!/usr/bin/env python3
"""Local replay of the driver's t2 oracle gate (test tooling only — the
Scala library has no python dependency). Usage:
    python3 tools/selfcheck.py /root/testdata/sf0.01 /tmp/verify_out
Compares each <outDir>/<name> parquet (written by graft.Verify) against the
DuckDB result of <outDir>/oracle_sql.json[name], with columns sorted by
name and rows sorted, values canonicalized.
"""
import sys, json, math, os
from decimal import Decimal
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, Decimal):
        return format(v.normalize(), "f")
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return str(v)


def fetch(con, sql):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], sorted(out)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    fails = 0
    for name in sorted(oracle):
        res_dir = os.path.join(out_dir, name)
        if not os.path.isdir(res_dir):
            print(f"FAIL {name}: no spark output")
            fails += 1
            continue
        gcols, got = fetch(con, f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
        wcols, want = fetch(con, oracle[name])
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} != {wcols}")
            fails += 1
        elif got != want:
            diff = [(a, b) for a, b in zip(got, want) if a != b][:3]
            print(f"FAIL {name}: {len(got)} vs {len(want)} rows; first diffs: {diff}")
            fails += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
    print(f"{'ALL GREEN' if fails == 0 else str(fails) + ' FAILURES'}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
