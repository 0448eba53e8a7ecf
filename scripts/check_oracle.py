#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run Verify output
against DuckDB oracles on the same parquet tables and diff.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark result ({e})")
            n_bad += 1
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        got = got[sorted(got.columns)].reset_index(drop=True)
        exp = exp[sorted(exp.columns)].reset_index(drop=True)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            n_bad += 1
            continue
        bad_cols = []
        for c in got.columns:
            a, b = got[c], exp[c]
            try:
                if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                    # hash-faithful for VALUES: compare IEEE-754 BYTES,
                    # not float ==, so a -0.0 vs 0.0 (or any formatting-
                    # class) artifact fails HERE exactly as it fails the
                    # driver's hash gate (the q145 r5 lesson). NaNs are
                    # canonicalized explicitly (engines can carry
                    # different NaN bit patterns — sign/payload — that
                    # struct.pack would preserve). KNOWN BLIND SPOT:
                    # the float64 pandas path surfaces SQL NULL and NaN
                    # as the same np.nan, so a NULL-vs-NaN engine
                    # divergence cannot be detected here — registry
                    # convention keeps NaN out of result columns
                    # (cosine zero-norm guards, nullif()-guarded
                    # divisions), making NULL the only absent-value
                    # representation in practice.
                    import struct
                    _nan = struct.pack("<d", float("nan"))

                    def packed(s):
                        return s.astype(float).map(
                            lambda x: _nan if x != x else struct.pack("<d", x))
                    eq = (packed(a) == packed(b)).all()
                else:
                    eq = (a.astype(str) == b.astype(str)).all()
            except Exception:
                eq = (a.astype(str) == b.astype(str)).all()
            if not eq:
                bad_cols.append(c)
        if bad_cols:
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:2]:
                mask = got[c].astype(str) != exp[c].astype(str)
                idx = mask[mask].index[:3]
                for i in idx:
                    print(f"    row {i} col {c}: spark={got[c][i]!r} duck={exp[c][i]!r}")
            n_bad += 1
        else:
            n_ok += 1
            print(f"OK   {name} ({len(got)} rows)")
    # queries without oracle → rows-only check
    import os
    declared = set(oracle)
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if os.path.isdir(p) and d not in declared:
            try:
                n = len(pd.read_parquet(p))
                print(f"ROWS {d} ({n} rows, no oracle)")
            except Exception as e:
                print(f"FAIL {d}: unreadable ({e})")
                n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad, {len(oracle)} oracled")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
