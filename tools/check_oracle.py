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

results = {}   # console strings (human summary, unchanged format)
detail = {}    # driver-schema per-query records for the JSON dump:
               # {rows_match, schema_match, hash_match, spark_rows,
               #  oracle_rows, err} — structurally identical to the
               # driver's CORRECTNESS_r{N}.json rows, so the committed
               # self-run artifact is diff-able against the driver's
               # the day that channel recovers, and a red day shows
               # WHICH check missed without a re-run
for name in sorted(oracle):
    spark_dir = f"{outdir}/{name}"
    rec = {"rows_match": False, "schema_match": False,
           "hash_match": False, "spark_rows": None,
           "oracle_rows": None, "err": None}
    if not os.path.isdir(spark_dir):
        results[name] = "MISSING_SPARK_RESULT"
        rec["err"] = "missing spark result dir"
        detail[name] = rec
        continue
    try:
        sdf = canon(pq.read_table(spark_dir).to_pandas())
        odf = canon(con.sql(oracle[name]).df())
        rec["spark_rows"] = len(sdf)
        rec["oracle_rows"] = len(odf)
        rec["schema_match"] = list(sdf.columns) == list(odf.columns)
        rec["rows_match"] = len(sdf) == len(odf)
        if not rec["schema_match"]:
            results[name] = f"SCHEMA_MISMATCH spark={list(sdf.columns)} oracle={list(odf.columns)}"
        elif not rec["rows_match"]:
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
            rec["hash_match"] = True
            results[name] = "OK"
    except Exception as e:
        results[name] = f"ERROR {type(e).__name__}: {e}"
        rec["err"] = f"{type(e).__name__}: {e}"
    detail[name] = rec

# queries without oracle → rows-only check
import re
for d in sorted(glob.glob(f"{outdir}/q*")):
    name = os.path.basename(d)
    if name not in oracle and os.path.isdir(d):
        rec = {"rows_match": None, "schema_match": None,
               "hash_match": None, "spark_rows": None,
               "oracle_rows": None, "err": None, "rows_only": True}
        try:
            n = pq.read_table(d).num_rows
            results[name] = f"ROWS_ONLY n={n}" + (" (EMPTY!)" if n == 0 else "")
            rec["spark_rows"] = n
            rec["rows_match"] = n > 0
        except Exception as e:
            results[name] = f"ERROR {e}"
            rec["err"] = str(e)
        detail[name] = rec

ok = sum(1 for v in results.values() if v == "OK" or v.startswith("ROWS_ONLY n=") and "EMPTY" not in v)
for k, v in results.items():
    print(f"{'✓' if v=='OK' or (v.startswith('ROWS_ONLY') and 'EMPTY' not in v) else '✗'} {k}: {v}")
print(f"\n{ok}/{len(results)} pass")
if json_out:
    with open(json_out, "w") as f:
        json.dump({"sf": sfdir, "pass": ok, "total": len(results),
                   "results": detail}, f, indent=1, sort_keys=True)
    print(f"wrote {json_out}")
