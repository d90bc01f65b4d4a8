#!/usr/bin/env python3
"""Local driver-simulator: run Verify's parquet output against the DuckDB
oracle and compare values exactly (sorted columns + rows), mirroring the
round harness. Usage: tools/check.py <verify_out_dir> <sf_dir> [names...]"""
import json, sys, glob, os
import duckdb
import numpy as np
import pandas as pd


def float_byte_mismatches(g: "pd.DataFrame", e: "pd.DataFrame"):
    """Columns whose float values differ at the BIT level (the driver's
    hash is byte-based, so -0.0 vs 0.0 or a NaN-payload difference fails
    there even though pandas numeric equality passes). Returns
    [(col, row_idx, got_bits, exp_bits)] for the first differing row of
    each bad column."""
    bad = []
    for c in g.columns:
        if g[c].dtype.kind != "f":
            continue
        ga = np.ascontiguousarray(g[c].to_numpy(dtype="float64"))
        ea = np.ascontiguousarray(e[c].to_numpy(dtype="float64"))
        gi, ei = ga.view("int64"), ea.view("int64")
        neq = gi != ei
        if neq.any():
            i = int(np.argmax(neq))
            bad.append((c, i, hex(int(gi[i]) & (2**64 - 1)),
                        hex(int(ei[i]) & (2**64 - 1))))
    return bad

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(out_dir, sf_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "MISSING-SPARK-OUTPUT"
            continue
        try:
            got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
            exp = con.sql(sql).df()
        except Exception as e:
            results[name] = f"ERROR: {str(e)[:200]}"
            continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA-MISMATCH got={list(g.columns)} exp={list(e.columns)}"
            continue
        if len(g) != len(e):
            results[name] = f"ROWCOUNT got={len(g)} exp={len(e)}"
            continue
        kinds = [(c, g[c].dtype.kind, e[c].dtype.kind) for c in g.columns
                 if g[c].dtype.kind != e[c].dtype.kind]
        if kinds:
            results[name] = f"DTYPE-MISMATCH {kinds}"
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            fb = float_byte_mismatches(g, e)
            if fb:
                results[name] = f"FLOAT-BYTES-MISMATCH {fb[:3]}"
            else:
                results[name] = f"OK ({len(g)} rows)"
        except AssertionError as ex:
            # retry with tolerance to distinguish float-noise from real bugs
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False, rtol=1e-9, atol=1e-12)
                results[name] = f"FLOAT-NOISE ({len(g)} rows)"
            except AssertionError:
                results[name] = "VALUE-MISMATCH: " + str(ex).split("\n")[0][:160]
    bad = 0
    for name, res in sorted(results.items()):
        flag = "" if res.startswith("OK") else " <<<"
        if flag:
            bad += 1
        print(f"{name:24s} {res}{flag}")
    # queries with no oracle: rows-only
    print(f"\n{len(results)} checked, {bad} failing")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
