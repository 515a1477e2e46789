#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB against the sf
parquet tables, canonicalizes both (columns sorted by name, rows sorted),
and compares values. Exits nonzero on any mismatch.
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def _sort_repr(v) -> str:
    # Null spellings differ per source (None from parquet object cols,
    # pd.NA from DuckDB nullable dtypes, NaN from floats); canonicalize so
    # both sides sort identically — otherwise a nullable leading column
    # (e.g. a boolean) misaligns every row behind it.
    try:
        if v is None or pd.isna(v):
            return "\x00null"
    except (TypeError, ValueError):
        pass
    return repr(v)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.map(_sort_repr))
    return df


def cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb  # exact: we engineered determinism
    return str(a) == str(b)


def decimal_cols(df: pd.DataFrame) -> list:
    """Columns carrying decimal.Decimal values. The driver hashes physical
    parquet encodings, and Spark decimal64/decimal128 never hash-matches
    DuckDB's — the repo convention is to cast final decimals to DOUBLE or
    VARCHAR, so any decimal output is flagged as a failure here even when
    the values compare equal (this is exactly how r1's p1/p2/l1 slipped
    past the old lax gate)."""
    import decimal
    out = []
    for col in df.columns:
        s = df[col].dropna()
        if len(s) and isinstance(s.iloc[0], decimal.Decimal):
            out.append(col)
    return out


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list:
    errs = []
    for side, df in (("spark", got), ("oracle", want)):
        for col in decimal_cols(df):
            errs.append(f"{side} col {col} is DECIMAL-typed: driver hash "
                        "will mismatch; cast to DOUBLE/VARCHAR per convention")
    if errs:
        return errs
    if sorted(got.columns) != sorted(want.columns):
        errs.append(f"columns differ: spark={sorted(got.columns)} "
                    f"oracle={sorted(want.columns)}")
        return errs
    if len(got) != len(want):
        errs.append(f"row count differs: spark={len(got)} oracle={len(want)}")
        return errs
    g, w = canon(got), canon(want)
    bad = 0
    for col in g.columns:
        gv, wv = g[col].tolist(), w[col].tolist()
        for i, (a, b) in enumerate(zip(gv, wv)):
            if not cell_eq(a, b):
                if bad < 3:
                    errs.append(f"col {col} row {i}: spark={a!r} oracle={b!r}")
                bad += 1
    if bad:
        errs.append(f"total mismatched cells: {bad}")
    return errs


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    failures = 0
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        try:
            got = pd.read_parquet(os.path.join(out_dir, name))
        except Exception as e:
            print(f"FAIL {name}: cannot read spark result: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(got)} rows)"
                  + ("  !! EMPTY" if len(got) == 0 else ""))
            if len(got) == 0:
                failures += 1
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        errs = compare(name, got, want)
        if errs:
            failures += 1
            print(f"FAIL {name}:")
            for e in errs:
                print(f"   {e}")
        else:
            print(f"OK   {name} ({len(got)} rows)")
    for name in oracles:
        if name not in names:
            print(f"FAIL {name}: oracle declared but no spark result written")
            failures += 1
    print(f"\n{len(names)} results, {failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
