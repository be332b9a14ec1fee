#!/usr/bin/env python3
"""Shared result normalization + hashing for the correctness gates.

One definition, imported by tools/validate.py (parent-side Spark
hashing) and tools/duck_hash_one.py (child-side oracle hashing at
scales where the oracle must run in a killable subprocess) — the
compare is only meaningful if both sides normalize identically.
"""
import hashlib

import pandas as pd


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), na_position="first")
    return df.reset_index(drop=True)


def h(df: pd.DataFrame) -> str:
    # Stringify every cell with full-precision str(): stricter than any
    # plausible driver hash — catches int64-vs-float64 dtype drift
    # (DuckDB sum(int) -> HUGEINT -> float64 "2.0" vs Spark long "2")
    # and last-ulp double differences that %.10g would round away.
    s = df.astype(object).where(df.notna(), None).map(
        lambda v: "\0" if v is None else str(v))
    return hashlib.md5(s.to_csv(index=False).encode()).hexdigest()
