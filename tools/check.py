#!/usr/bin/env python3
"""Dev-only pre-check harness (mirrors the driver's DuckDB compare).

NOT part of the library. Runs each oracle SQL from oracle_sql.json in
DuckDB against the same parquet tables, loads the Spark result parquet,
sorts columns by name, and compares values.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import numpy as np
import pandas as pd


def signbit_mismatch(got: pd.DataFrame, want: pd.DataFrame):
    """Signed-zero divergence the driver's hash catches but pandas
    equality does not (-0.0 == 0.0): for every float column, any cell
    where both sides are zero-valued but the sign bits differ.
    Returns [(column, n_cells)]. (CORRECTNESS_r11: tq33_heaps — Spark
    round() -> BigDecimal -> +0.0, DuckDB rounds sign-preservingly
    -> -0.0.)"""
    bad = []
    for c in got.columns:
        if not pd.api.types.is_float_dtype(got[c].dtype):
            continue
        g = got[c].to_numpy(dtype="float64", na_value=np.nan)
        w = want[c].to_numpy(dtype="float64", na_value=np.nan)
        zeros = (g == 0.0) & (w == 0.0)
        n = int(np.count_nonzero(zeros &
                                 (np.signbit(g) != np.signbit(w))))
        if n:
            bad.append((c, n))
    return bad

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # row order should be pinned by ORDER BY, but sort for robustness
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    # int width is cosmetic (Spark INT vs DuckDB BIGINT); int-vs-float is NOT
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df


def family(dt) -> str:
    """Dtype family the driver's hash is sensitive to: int widths collapse,
    but int-vs-float and tz-aware-vs-naive timestamps are real mismatches
    (CORRECTNESS_r01: q11/q13/mm1 HUGEINT->float64, q10/st1 tz-aware µs)."""
    if pd.api.types.is_integer_dtype(dt): return "int"
    if pd.api.types.is_bool_dtype(dt): return "bool"
    if pd.api.types.is_float_dtype(dt): return "float"
    return str(dt)  # datetimes keep unit+tz; strings/objects as-is

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for name in ("region nation customer supplier part orders lineitem "
                 "events documents embeddings").split():
        p = f"{sf_dir}/{name}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for qname, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{qname}/*.parquet")
        if not spark_files:
            print(f"FAIL {qname}: no spark output"); n_fail += 1; continue
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet({spark_files!r})").fetchdf())
            want = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {qname}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {qname}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {qname}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        bad = [c for c in got.columns
               if family(got[c].dtype) != family(want[c].dtype)]
        if bad:
            print(f"FAIL {qname}: dtype mismatch "
                  f"{[(c, str(got[c].dtype), str(want[c].dtype)) for c in bad]}")
            n_fail += 1; continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
            zbad = signbit_mismatch(got, want)
            if zbad:
                print(f"FAIL {qname}: signed-zero mismatch {zbad} "
                      f"(spark vs oracle sign bit on zero cells)")
                n_fail += 1; continue
            print(f"PASS {qname} ({len(got)} rows)"); n_pass += 1
        except AssertionError as e:
            print(f"FAIL {qname}: {str(e).splitlines()[-1] if str(e) else e}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
