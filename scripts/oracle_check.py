#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare each Verify-dumped
Spark result against its DuckDB oracle on the same parquet tables.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"EMPTY {name}: no parquet written"); n_fail += 1; continue
        spark_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        if name not in oracles:
            n = spark_rel.aggregate("count(*)").fetchone()[0]
            status = "ROWS-ONLY" if n > 0 else "ROWS-ONLY-EMPTY!"
            if n == 0: n_fail += 1
            else: n_skip += 1
            print(f"{status:18s} {name}: rows={n}")
            continue
        try:
            oracle = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"ORACLE-ERR {name}: {str(ex)[:160]}"); n_fail += 1; continue
        spark = spark_rel.df()
        # driver-style: sort columns by name, then rows by all values
        sc = spark[sorted(spark.columns)]
        oc = oracle[sorted(oracle.columns)]
        if list(sc.columns) != list(oc.columns):
            print(f"SCHEMA-MISMATCH {name}: spark={list(sc.columns)} oracle={list(oc.columns)}")
            n_fail += 1; continue
        if len(sc) != len(oc):
            print(f"ROWCOUNT {name}: spark={len(sc)} oracle={len(oc)}"); n_fail += 1; continue
        sc = sc.sort_values(by=list(sc.columns)).reset_index(drop=True)
        oc = oc.sort_values(by=list(oc.columns)).reset_index(drop=True)
        bad = None
        for col in sc.columns:
            a, b = sc[col], oc[col]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                bad = (col, i, a.iloc[i], b.iloc[i], int((~eq).sum()))
                break
        if bad:
            col, i, av, bv, cnt = bad
            print(f"VALUE-MISMATCH {name}: col={col} row={i} spark={av!r} oracle={bv!r} ({cnt} cells differ)")
            n_fail += 1
        else:
            print(f"PASS              {name}: rows={len(sc)}")
            n_pass += 1
    print(f"\n== oracle PASS {n_pass}  rows-only {n_skip}  FAIL {n_fail} ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
