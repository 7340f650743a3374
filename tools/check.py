#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> (spark parquet dir), runs the matching
oracle SQL from oracle_sql.json in DuckDB over views registered on
<sfDir>/*.parquet, and compares: column names (sorted), row count, and
exact values (rows sorted by all columns). Prints PASS/FAIL per query.
"""
import json
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            # tz-aware (spark LTZ) vs naive (duckdb): strip tz, micros
            try:
                s = s.dt.tz_localize(None)
            except (TypeError, AttributeError):
                pass
            s = s.dt.floor("us")
            df[c] = s
        elif s.dtype == object:
            df[c] = s.map(lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                          hasattr(v, "__len__") and not isinstance(v, (str, bytes, dict))
                          else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_df: pd.DataFrame, oracle_df: pd.DataFrame) -> str:
    sc, oc = sorted(spark_df.columns), sorted(oracle_df.columns)
    if sc != oc:
        return f"FAIL cols spark={sc} oracle={oc}"
    if len(spark_df) != len(oracle_df):
        return f"FAIL rows spark={len(spark_df)} oracle={len(oracle_df)}"
    a, b = normalize(spark_df), normalize(oracle_df)
    for c in a.columns:
        # driver's hash gate stringifies values: int width diffs are
        # harmless (5 == 5) but float-vs-int is not (1.0 != 1) — flag
        # only kind mismatches
        if a[c].dtype.kind != b[c].dtype.kind:
            return (f"FAIL dtype col {c}: spark={a[c].dtype} "
                    f"oracle={b[c].dtype}")
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            eq = (av.isna() & bv.isna()) | (av == bv)
        else:
            an, bn = av.isna() if av.dtype != object else av.isnull(), bv.isnull()
            eq = (an & bn) | (av.astype(object) == bv.astype(object))
        if not eq.all():
            i = int((~eq).idxmax())
            return (f"FAIL col {c} row {i}: spark={a[c][i]!r} oracle={b[c][i]!r} "
                    f"(n_mismatch={int((~eq).sum())})")
    return "PASS"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle_sql = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = n_skip = 0
    all_query_dirs = sorted(
        p.name for p in Path(out_dir).iterdir() if p.is_dir())
    for name in all_query_dirs:
        try:
            spark_df = pq.read_table(Path(out_dir, name)).to_pandas()
        except Exception as e:
            print(f"{name:28s} FAIL spark output unreadable: {e}")
            n_fail += 1
            continue
        if name not in oracle_sql:
            status = "SKIP(no-oracle)" if len(spark_df) > 0 else "FAIL empty rows-only result"
            if len(spark_df) > 0:
                n_skip += 1
            else:
                n_fail += 1
            print(f"{name:28s} {status} rows={len(spark_df)}")
            continue
        try:
            oracle_df = con.sql(oracle_sql[name]).df()
        except Exception as e:
            print(f"{name:28s} FAIL oracle sql error: {str(e)[:150]}")
            n_fail += 1
            continue
        r = compare(name, spark_df, oracle_df)
        # a 0-row hash match is VACUOUS, not green (round 5:
        # e2e_webcorpus silently matched the oracle on emptiness at
        # every scale) — keep it PASS for the gate but make it loud
        if r == "PASS" and len(spark_df) == 0:
            r = "PASS (VACUOUS: 0 rows on both engines)"
        print(f"{name:28s} {r[:200]}")
        if r.startswith("PASS"):
            n_pass += 1
        else:
            n_fail += 1
    missing = set(oracle_sql) - set(all_query_dirs)
    for m in sorted(missing):
        print(f"{m:28s} FAIL no spark output written")
        n_fail += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
