#!/usr/bin/env python3
"""Dev-only harness that mimics the driver's correctness gate:
runs each oracle_sql.json entry in DuckDB over the testdata tables,
reads the corresponding Spark result parquet, and compares
(sorted-by-column-name values), both order-sensitive and -insensitive.

Usage: python3 tools/check_correctness.py <sfDir> <outDir> [--pandas]

--pandas additionally replicates the DRIVER's canonicalization
pathway, which is dtype-sensitive where the tuple compare is not:
  spark side  = pyarrow.parquet -> to_pandas()
  oracle side = duckdb .df()     (NB: HUGEINT/DECIMAL land as float64)
  both        : columns sorted by name, df.sort_values(all columns),
                pd.util.hash_pandas_object(df, index=False)
A query can be tuple-exact yet pandas-red when the two sides disagree
on dtype (e.g. an uncast DuckDB sum() is HUGEINT -> float64 vs
Spark's int64 — round-5 q100), or error outright when a column is
array-typed (sort_values factorizes object arrays — round-5 q110).
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        return float(v)
    return v


def pandas_check(name, res_glob, con, sql):
    """Driver-faithful dtype-sensitive compare. Returns (ok, msg)."""
    import pandas as pd
    import pyarrow.parquet as pq
    import pyarrow as pa
    try:
        tabs = [pq.read_table(f) for f in sorted(glob.glob(res_glob))]
        sdf = pa.concat_tables(tabs).to_pandas()
        ddf = con.sql(sql).df()
    except Exception as e:
        return False, f"load error: {str(e)[:160]}"
    scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
    if scols != dcols:
        return False, f"columns {scols} vs {dcols}"
    sdf, ddf = sdf[scols], ddf[dcols]
    dt_mismatch = [f"{c}: spark={sdf[c].dtype} duck={ddf[c].dtype}"
                   for c in scols if sdf[c].dtype != ddf[c].dtype]
    try:
        sdf = sdf.sort_values(scols, kind="mergesort").reset_index(drop=True)
        ddf = ddf.sort_values(dcols, kind="mergesort").reset_index(drop=True)
    except Exception as e:
        return False, f"sort_values error (array/unsortable col?): {str(e)[:160]}"
    try:
        sh = pd.util.hash_pandas_object(sdf, index=False)
        dh = pd.util.hash_pandas_object(ddf, index=False)
    except Exception as e:
        return False, f"hash error: {str(e)[:160]}"
    if len(sh) != len(dh) or not (sh.values == dh.values).all():
        why = ("; dtype mismatch: " + ", ".join(dt_mismatch)) if dt_mismatch else ""
        return False, f"pandas hash mismatch ({len(sh)} vs {len(dh)} rows){why}"
    if dt_mismatch:
        # identical hashes but differing dtypes — fragile, surface it
        return True, "dtype drift (hash still equal): " + ", ".join(dt_mismatch)
    return True, ""


def main(sf_dir, out_dir, pandas_mode=False):
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
            if pandas_mode:
                pok, pmsg = pandas_check(name, res_glob, con, oracle[name])
                if not pok:
                    print(f"PFAIL {name}: {pmsg}")
                    n_bad += 1
                    continue
                note = f" [{pmsg}]" if pmsg else ""
                print(f"OK   {name}: {len(s)} rows (exact, ordered, pandas){note}")
            else:
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
    sys.exit(main(sys.argv[1], sys.argv[2], "--pandas" in sys.argv[3:]))
