#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the
matching oracle SQL from oracle_sql.json in DuckDB against the parquet
tables in <sfDir>, sorts columns by name and rows by all columns, and
compares values exactly (with a small float tolerance fallback report).
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    # normalize ints/floats
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df


def compare(name, spark_df, oracle_df):
    a, b = norm(spark_df), norm(oracle_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH spark={len(a)} oracle={len(b)}"
    exact = True
    approx = True
    detail = []
    # The driver hashes VALUES as rendered by pandas, so an integral
    # Spark column against a float-rendered oracle column (DuckDB
    # HUGEINT/DOUBLE -> float64) hash-mismatches even when every value
    # is numerically equal (23 vs 23.0). The float-tolerant branch
    # below would hide exactly that, so flag the dtype split first.
    for c in a.columns:
        ai = pd.api.types.is_integer_dtype(a[c])
        bi = pd.api.types.is_integer_dtype(b[c])
        af = pd.api.types.is_float_dtype(a[c])
        bf = pd.api.types.is_float_dtype(b[c])
        if (ai and bf) or (af and bi):
            return (
                f"DTYPE SPLIT col {c}: spark={a[c].dtype} oracle={b[c].dtype}"
                " (driver hashes 23 vs 23.0 as different — CAST the oracle"
                " column to BIGINT or the Spark column to double)"
            )
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = av.astype("float64")
            bv = bv.astype("float64")
            eq = [
                (math.isnan(x) and math.isnan(y)) or x == y
                for x, y in zip(av.fillna(float("nan")), bv.fillna(float("nan")))
            ]
            if not all(eq):
                exact = False
                close = [
                    (math.isnan(x) and math.isnan(y))
                    or abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y))
                    for x, y in zip(av.fillna(float("nan")), bv.fillna(float("nan")))
                ]
                bad = eq.count(False)
                if not all(close):
                    approx = False
                i = eq.index(False)
                detail.append(f"col {c}: {bad} diffs e.g. row{i}: {av[i]!r} vs {bv[i]!r}")
        else:
            av2 = av.astype(object).where(pd.notnull(av), None)
            bv2 = bv.astype(object).where(pd.notnull(bv), None)
            if not av2.equals(bv2):
                exact = False
                approx = False
                diffs = [i for i, (x, y) in enumerate(zip(av2, bv2)) if x != y]
                if diffs:
                    i = diffs[0]
                    detail.append(
                        f"col {c}: {len(diffs)} diffs e.g. row{i}: {av2[i]!r} vs {bv2[i]!r}"
                    )
                else:
                    # dtype-only / NaN-inside-object mismatch: equals()
                    # failed but no elementwise diff surfaced
                    detail.append(
                        f"col {c}: series mismatch (dtype {av.dtype} vs {bv.dtype})"
                    )
    if exact:
        return None
    tag = "APPROX-ONLY" if approx else "VALUE MISMATCH"
    return f"{tag}: " + "; ".join(detail[:4])


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    names = sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d))
    )
    n_pass = n_fail = n_noracle = 0
    for name in names:
        spark_df = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'"
        ).df()
        if name not in oracles:
            n_noracle += 1
            print(f"  [no-oracle] {name}: {len(spark_df)} rows")
            continue
        try:
            # HUGEINT lint: DuckDB windowed/plain SUM(BIGINT) widens to
            # HUGEINT, which pandas renders float64 — the driver then
            # hashes 23.0 vs Spark's 23 (bit text10_pack in r4 and
            # text01 before it). No Spark type maps to HUGEINT, so any
            # occurrence is an oracle bug: CAST it.
            desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
            huge = [d[0] for d in desc if "HUGEINT" in str(d[1]).upper()]
            if huge:
                n_fail += 1
                print(f"  [FAIL] {name}: oracle emits HUGEINT col(s) {huge}"
                      " — CAST(... AS BIGINT) in the oracle SQL")
                continue
            oracle_df = con.execute(oracles[name]).df()
        except Exception as e:
            n_fail += 1
            print(f"  [FAIL] {name}: oracle SQL error: {e}")
            continue
        err = compare(name, spark_df, oracle_df)
        if err:
            n_fail += 1
            print(f"  [FAIL] {name}: {err}")
        else:
            n_pass += 1
            print(f"  [pass] {name} ({len(spark_df)} rows)")
    print(f"== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
