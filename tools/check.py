#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
Loads each <outDir>/<name> parquet, runs the matching oracle SQL from
<outDir>/oracle_sql.json in DuckDB with views over <sfDir>'s tables,
and compares: row count, column names (sorted), and cell values
(rows sorted, doubles to 9 sig figs).
"""
import sys, json, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    return sorted(cols), sorted(out)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name in sorted(oracle):
        d = f"{out_dir}/{name}"
        if not glob.glob(f"{d}/*.parquet"):
            print(f"FAIL {name}: no spark output at {d}")
            failed.append(name); continue
        got = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        gcols, grows = norm_rows(got.columns, got.fetchall())
        try:
            exp = con.sql(oracle[name])
            ecols, erows = norm_rows(exp.columns, exp.fetchall())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failed.append(name); continue
        if gcols != ecols:
            print(f"FAIL {name}: cols spark={gcols} oracle={ecols}")
            failed.append(name); continue
        if len(grows) != len(erows):
            print(f"FAIL {name}: rows spark={len(grows)} oracle={len(erows)}")
            failed.append(name); continue
        if grows != erows:
            bad = [i for i, (a, b) in enumerate(zip(grows, erows)) if a != b]
            print(f"FAIL {name}: {len(bad)} mismatched rows; first: "
                  f"spark={grows[bad[0]]} oracle={erows[bad[0]]} cols={gcols}")
            failed.append(name); continue
        print(f"PASS {name}: {len(grows)} rows")
    print(f"== {len(oracle)-len(failed)}/{len(oracle)} pass ==")
    return 1 if failed else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
