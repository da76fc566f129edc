#!/usr/bin/env python3
"""Dev-only harness that mimics the driver's correctness gate:
runs each oracle_sql.json entry in DuckDB over the testdata tables,
reads the corresponding Spark result parquet, and compares
(sorted-by-column-name values), both order-sensitive and -insensitive.

Usage: python3 tools/check_correctness.py <sfDir> <outDir>
(after `sbt "runMain graft.Verify <sfDir> <outDir>"`)
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        return float(v)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        res_glob = f"{out_dir}/{name}/*.parquet"
        files = glob.glob(res_glob)
        if not files:
            print(f"FAIL {name}: no spark result parquet")
            n_bad += 1
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM '{res_glob}'")
            spark_cols = sorted(spark_rel.columns)
            spark_rows = con.sql(
                f"SELECT {', '.join(spark_cols)} FROM '{res_glob}'").fetchall()
            duck_rel = con.sql(oracle[name])
            duck_cols = sorted(duck_rel.columns)
            duck_rows = con.sql(
                f"SELECT {', '.join(duck_cols)} FROM ({oracle[name]}) oq").fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {str(e)[:200]}")
            n_bad += 1
            continue
        if spark_cols != duck_cols:
            print(f"FAIL {name}: columns {spark_cols} vs {duck_cols}")
            n_bad += 1
            continue
        s = [tuple(canon(v) for v in r) for r in spark_rows]
        d = [tuple(canon(v) for v in r) for r in duck_rows]
        if s == d:
            print(f"OK   {name}: {len(s)} rows (exact, ordered)")
            n_ok += 1
        elif sorted(map(repr, s)) == sorted(map(repr, d)):
            print(f"OK~  {name}: {len(s)} rows (order differs!)")
            n_ok += 1
        else:
            n_bad += 1
            extra_s = [r for r in s if r not in d][:3]
            extra_d = [r for r in d if r not in s][:3]
            print(f"FAIL {name}: {len(s)} spark rows vs {len(d)} duck rows")
            print(f"     spark-only: {extra_s}")
            print(f"     duck-only : {extra_d}")
    print(f"\n{n_ok} ok, {n_bad} bad of {len(oracle)}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
