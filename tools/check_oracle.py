#!/usr/bin/env python3
"""DEV-ONLY harness (not part of the shipped Scala library).

Mirrors the driver's correctness gate locally: reads the parquet results
graft.Verify wrote, runs each oracle SQL in DuckDB over the same testdata
parquet, and compares schema + values (columns sorted by name, rows sorted)
so oracle mismatches are caught before the round gate runs.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [--lenient]

Dtype-strict by default: a residual dtype mismatch after canonicalization
(e.g. DuckDB SUM(BIGINT) -> HUGEINT -> float64/object vs Spark's int64) is
a FAIL, because the driver's hash compare is over serialized values and
such a drift flips the hash even when check_dtype=False value-compare
passes (this is exactly how the q46 HUGEINT bug slipped in round 3).
Pass --lenient to downgrade dtype diffs to warnings.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to ns, utc-naive
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        if str(df[c].dtype) == "object":
            df[c] = df[c].astype(str)
        if str(df[c].dtype) in ("int32", "int16", "int8", "uint32"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, out_dir: str, strict_dtype: bool = True) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    n_skip = 0
    for name, sql in sorted(oracle.items()):
        import os
        if not os.path.isdir(f"{out_dir}/{name}"):
            n_skip += 1  # subset Verify run (dev-only filter arg)
            continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
            n_bad += 1
            continue
        if got.shape != want.shape:
            print(f"FAIL {name}: shape {got.shape} vs {want.shape}")
            n_bad += 1
            continue
        dtype_diff = [(c, str(got[c].dtype), str(want[c].dtype))
                      for c in got.columns if str(got[c].dtype) != str(want[c].dtype)]
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                          check_exact=True)
        except AssertionError as e:
            print(f"FAIL {name}: values differ\n{str(e)[:500]}")
            n_bad += 1
            continue
        if dtype_diff and strict_dtype:
            print(f"FAIL {name}: dtype mismatch (driver hash would differ): "
                  f"{dtype_diff}")
            n_bad += 1
            continue
        tag = f" (dtype diff: {dtype_diff})" if dtype_diff else ""
        print(f"OK   {name}: {got.shape[0]} rows{tag}")
    checked = len(oracle) - n_skip
    skip_tag = f" ({n_skip} skipped: no result dir)" if n_skip else ""
    print(f"\n{checked - n_bad}/{checked} queries match{skip_tag}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  strict_dtype="--lenient" not in sys.argv[3:]))
