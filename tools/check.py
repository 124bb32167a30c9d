#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet written by graft.Verify, runs the matching SQL
from oracle_sql.json in DuckDB over the raw testdata parquet, and compares:
row count, column names, and a hash of the value matrix with columns sorted
by name and rows sorted canonically. Mirrors (as closely as we can infer)
what the driver's CORRECTNESS_r{N}.json check does.
"""
import sys, json, glob, os, hashlib
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        # driver-style normalization: repr of float
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    mat = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for r in mat:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        got_cols = [d[0] for d in con.description]
        if name not in oracles:
            print(f"rows-only {name}: {len(got)} rows (no oracle)")
            continue
        try:
            exp = con.execute(oracles[name]).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: columns {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        hg, he = canon(got, got_cols), canon(exp, exp_cols)
        if hg != he:
            print(f"FAIL {name}: hash mismatch over {len(got)} rows")
            # show first differing row for debugging
            order = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
            g = sorted(tuple(norm_cell(r[i]) for i in order) for r in got)
            e = sorted(tuple(norm_cell(r[i]) for i in order) for r in exp)
            for a, b in zip(g, e):
                if a != b:
                    print(f"  got: {a}\n  exp: {b}")
                    break
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
