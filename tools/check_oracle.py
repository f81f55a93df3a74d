#!/usr/bin/env python3
"""Local pre-validation of SparkEntry.oracleSql against Verify output.

Mimics the driver's correctness gate: for each query, load the Spark
result parquet (written by `sbt "runMain graft.Verify <sfDir> <outDir>"`)
and the DuckDB oracle result over the same sf tables, sort columns by
name and rows by value, and compare.

Usage: python3 tools/check_oracle.py <sfDir> <outDir>
"""
import sys, os, json, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)

def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"[MISS] {name}: no spark result at {spark_dir}")
            failures += 1
            continue
        sres = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        scols = [d[0] for d in con.description]
        try:
            ores = con.execute(sql).fetchall()
            ocols = [d[0] for d in con.description]
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}")
            failures += 1
            continue
        sc, sr = norm_rows(scols, sres)
        oc, orr = norm_rows(ocols, ores)
        if sc != oc:
            print(f"[SCHEMA] {name}: spark={sc} oracle={oc}")
            failures += 1
        elif sr != orr:
            diff_s = [r for r in sr if r not in set(orr)][:3]
            diff_o = [r for r in orr if r not in set(sr)][:3]
            print(f"[ROWS] {name}: spark={len(sr)} oracle={len(orr)}")
            print(f"        spark-only: {diff_s}")
            print(f"        oracle-only: {diff_o}")
            failures += 1
        else:
            print(f"[OK] {name}: {len(sr)} rows")
    # queries without oracle = rows-only check
    for d in sorted(os.listdir(out_dir)):
        if os.path.isdir(os.path.join(out_dir, d)) and d not in oracle:
            n = con.execute(
                f"SELECT count(*) FROM read_parquet('{out_dir}/{d}/*.parquet')").fetchone()[0]
            print(f"[ROWS-ONLY] {d}: {n} rows")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return failures

if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
