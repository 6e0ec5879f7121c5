#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark result), runs the matching
SQL from oracle_sql.json in DuckDB over the parquet tables in <sfDir>,
sorts columns by name + rows, and compares values exactly.

This is builder-side tooling only (not part of the shipped library).
"""
import json
import math
import sys

import duckdb
import pyarrow.dataset as pads

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    # Values compare as rendered strings, not Python equality: the driver
    # hashes rendered values, so int 5 vs float 5.0 must MISMATCH here too.
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        rr = []
        for i in order:
            v = r[i]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"
            elif v is None:
                v = "<NULL>"
            else:
                v = str(v)
            rr.append(v)
        out.append(tuple(rr))
    out.sort()
    return [cols[i] for i in order], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = sys.argv[3:]  # optional substrings restricting which queries run
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and not any(o in name for o in only):
            continue
        try:
            # Go through pandas on BOTH sides, mirroring the driver's
            # comparator: dtype artifacts (e.g. DuckDB HUGEINT -> float64,
            # so 5 renders as "5.0") must fail here like they fail there.
            s_df = pads.dataset(f"{out_dir}/{name}").to_table().to_pandas()
            s_cols = list(s_df.columns)
            s_rows = [tuple(r) for r in s_df.itertuples(index=False, name=None)]
            d_df = con.sql(sql).df()
            d_cols = list(d_df.columns)
            d_rows = [tuple(r) for r in d_df.itertuples(index=False, name=None)]
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        sc, sr = canon(s_rows, s_cols)
        dc, dr = canon(d_rows, d_cols)
        if sc != dc:
            print(f"FAIL {name}: columns spark={sc} duck={dc}")
            n_fail += 1
            continue
        # int32 vs int64 renders identically and passes at the driver;
        # what breaks the driver's hash is a KIND change (int vs float vs
        # object — e.g. DuckDB HUGEINT arriving as float64).
        s_dt = {c: t.kind for c, t in s_df.dtypes.items()}
        d_dt = {c: t.kind for c, t in d_df.dtypes.items()}
        dt_bad = {c: (s_dt[c], d_dt[c]) for c in s_dt
                  if s_dt[c] != d_dt[c]}
        if dt_bad:
            print(f"FAIL {name}: dtype-kind drift {dt_bad}")
            n_fail += 1
            continue
        if len(sr) != len(dr):
            print(f"FAIL {name}: rows spark={len(sr)} duck={len(dr)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(sr, dr)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(sr)} rows differ; "
                  f"first at {i}:\n  spark={a}\n  duck ={b}\n  cols={sc}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
