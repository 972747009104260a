#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (driver-side python only —
NOT part of the shipped library). Runs after `graft.Verify` has dumped
results: compares each outDir/<name> parquet against the DuckDB oracle SQL
from outDir/oracle_sql.json, strictly (sorted columns, sorted rows, exact
values) — stricter than any hash compare the driver might use.

Usage: python3 tools/check.py [sfDir] [outDir]
"""
import duckdb, json, sys, os, glob
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # widen ints so int32 vs int64 doesn't fail the value compare (schema
    # width is checked separately below)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


# DuckDB result types the driver's comparison frame maps 1:1 onto a Spark
# parquet dtype. Anything outside — HUGEINT (un-cast SUM(BIGINT)),
# DECIMAL (un-cast money), FLOAT (float32) — silently widens/narrows in
# pandas and then hash-mismatches the driver even when every VALUE is
# identical (the r14 q95 failure class). Oracle SQL must CAST its way
# into this set.
ALLOWED_DUCK = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE",
                "BOOLEAN", "VARCHAR", "DATE", "BLOB"}
ALLOWED_DUCK_PREFIX = ("TIMESTAMP",)  # TIMESTAMP, TIMESTAMP WITH TIME ZONE


def dtype_class(duck_type: str) -> str:
    t = duck_type.upper()
    if t in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "HUGEINT",
             "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT", "UHUGEINT"):
        return "int"
    if t in ("DOUBLE", "FLOAT") or t.startswith("DECIMAL"):
        return "float"
    if t.startswith("TIMESTAMP") or t == "DATE":
        return "time"
    if t == "BOOLEAN":
        return "bool"
    if t.startswith("STRUCT") or t.endswith("[]") or t.startswith("MAP"):
        return "nested"
    return "str" if t == "VARCHAR" else t.lower()


def dtype_gate(con, name, sql, spark_glob):
    """The r15 oracle-dtype guard: DESCRIBE both sides, fail on any
    oracle column type outside the driver-safe set, and on any
    class mismatch (int vs float etc.) between oracle and spark."""
    errs = []
    exp_t = {r[0]: r[1] for r in
             con.execute(f"DESCRIBE {sql}").fetchall()}
    got_t = {r[0]: r[1] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{spark_glob}')").fetchall()}
    for c, t in sorted(exp_t.items()):
        tu = t.upper()
        if tu not in ALLOWED_DUCK and not tu.startswith(ALLOWED_DUCK_PREFIX) \
                and dtype_class(t) != "nested":
            errs.append(f"oracle col {c} has driver-unsafe type {t} "
                        f"(CAST it: HUGEINT/DECIMAL/FLOAT hash-mismatch)")
    for c in sorted(set(exp_t) & set(got_t)):
        ec, gc = dtype_class(exp_t[c]), dtype_class(got_t[c])
        if ec != gc:
            errs.append(f"col {c} dtype class: oracle {exp_t[c]} ({ec}) "
                        f"vs spark {got_t[c]} ({gc})")
    return errs


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_fail = 0
    for name in sorted(oracle):
        sql = oracle[name]
        path = f"{out}/{name}"
        try:
            exp = normalize(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if not glob.glob(f"{path}/*.parquet"):
            print(f"FAIL {name}: no spark output at {path}")
            n_fail += 1
            continue
        dt_errs = dtype_gate(con, name, sql, f"{path}/*.parquet")
        if dt_errs:
            print(f"FAIL {name}: dtype gate: " + "; ".join(dt_errs))
            n_fail += 1
            continue
        got = normalize(duckdb.connect().execute(
            f"SELECT * FROM read_parquet('{path}/*.parquet')").df())
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            n_fail += 1
            continue
        bad = None
        for c in exp.columns:
            e, g = exp[c], got[c]
            if pd.api.types.is_float_dtype(e):
                eq = (e.values == g.values) | (np.isnan(e.values) & np.isnan(g.values))
            else:
                eq = (e.values == g.values) | (e.isna().values & g.isna().values)
            if not eq.all():
                i = int(np.argmin(eq))
                bad = f"col {c} row {i}: exp={e.iloc[i]!r} got={g.iloc[i]!r} ({int((~eq).sum())} diffs)"
                break
        if bad:
            print(f"FAIL {name}: {bad}")
            n_fail += 1
        else:
            print(f"ok   {name} ({len(exp)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
