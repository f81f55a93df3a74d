#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: run each oracle SQL
from a Verify dump in DuckDB over the same parquet tables and compare to
the Spark result (columns sorted by name, rows sorted, values hashed the
same way the driver does — approximately: exact repr compare here).

Usage: python3 tools/compare_oracle.py <verify_out_dir> <sf_dir>
"""
import sys, os, json, glob
import duckdb

def load(verify_dir, sf_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}/*.parquet')"
                    if os.path.isdir(p) else
                    f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    return con

def canon(df):
    # driver compare: sort columns by name, round floats, sort rows
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == "float64" or df[c].dtype == "float32":
            df[c] = df[c].round(6)
    rows = sorted(tuple(map(str, r)) for r in df.itertuples(index=False))
    return rows

def main():
    verify_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(verify_dir, "oracle_sql.json")))
    con = load(verify_dir, sf_dir)
    bad = 0
    for name, sql in sorted(oracle.items()):
        spark_glob = os.path.join(verify_dir, name, "*.parquet")
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{spark_glob}')").df()
            odf = con.execute(sql).df()
            s, o = canon(sdf), canon(odf)
            schema_ok = sorted(sdf.columns) == sorted(odf.columns)
            ok = s == o and schema_ok
        except Exception as e:
            ok, schema_ok = False, False
            print(f"{name}: ERROR {e}")
            bad += 1
            continue
        if not ok:
            bad += 1
            print(f"{name}: MISMATCH rows spark={len(s)} oracle={len(o)} "
                  f"schema_ok={schema_ok}")
            for a, b in list(zip(s, o))[:3]:
                if a != b:
                    print(f"  spark  {a}\n  oracle {b}")
                    break
        else:
            print(f"{name}: ok ({len(s)} rows)")
    print(f"\n{'ALL OK' if bad == 0 else f'{bad} FAILURES'}")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
