#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: read the Verify dump,
run each oracle SQL in DuckDB over the same sf dir, and compare
(column-name-sorted, row-sorted, value-hashed)."""
import sys, json, glob, os, hashlib
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
# optional: also dump the per-query results as JSON (the committed
# CORRECTNESS_SELF_r<N>.json self-run artifact — makes an empty
# driver-side correctness file diagnosable in seconds)
json_out = sys.argv[3] if len(sys.argv) > 3 else None

con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize tz-aware → naive, ns → us
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except Exception:
                pass
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)

def h(df: pd.DataFrame) -> str:
    return hashlib.md5(df.to_csv(index=False, float_format="%.17g").encode()).hexdigest()

results = {}
for name in sorted(oracle):
    spark_dir = f"{outdir}/{name}"
    if not os.path.isdir(spark_dir):
        results[name] = "MISSING_SPARK_RESULT"
        continue
    try:
        sdf = canon(pq.read_table(spark_dir).to_pandas())
        odf = canon(con.sql(oracle[name]).df())
        if list(sdf.columns) != list(odf.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(sdf.columns)} oracle={list(odf.columns)}"
        elif len(sdf) != len(odf):
            results[name] = f"ROWCOUNT spark={len(sdf)} oracle={len(odf)}"
        elif h(sdf) != h(odf):
            # find first differing cell for debugging
            diff = None
            for c in sdf.columns:
                if not sdf[c].equals(odf[c]):
                    neq = (sdf[c].astype(str) != odf[c].astype(str))
                    i = neq.idxmax()
                    diff = f"col={c} row={i} spark={sdf[c][i]!r} oracle={odf[c][i]!r}"
                    break
            results[name] = f"HASH_MISMATCH {diff}"
        else:
            results[name] = "OK"
    except Exception as e:
        results[name] = f"ERROR {type(e).__name__}: {e}"

# queries without oracle → rows-only check
import re
for d in sorted(glob.glob(f"{outdir}/q*")):
    name = os.path.basename(d)
    if name not in oracle and os.path.isdir(d):
        try:
            n = pq.read_table(d).num_rows
            results[name] = f"ROWS_ONLY n={n}" + (" (EMPTY!)" if n == 0 else "")
        except Exception as e:
            results[name] = f"ERROR {e}"

ok = sum(1 for v in results.values() if v == "OK" or v.startswith("ROWS_ONLY n=") and "EMPTY" not in v)
for k, v in results.items():
    print(f"{'✓' if v=='OK' or (v.startswith('ROWS_ONLY') and 'EMPTY' not in v) else '✗'} {k}: {v}")
print(f"\n{ok}/{len(results)} pass")
if json_out:
    with open(json_out, "w") as f:
        json.dump({"sf": sfdir, "pass": ok, "total": len(results),
                   "results": results}, f, indent=1, sort_keys=True)
    print(f"wrote {json_out}")
