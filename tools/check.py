#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [name ...]

Driver-faithful since round 9: both sides (the Spark parquet written by
graft.Verify and the DuckDB oracle result) are materialized through
`fetchdf()` — i.e. through pandas dtype coercion — before hashing, because
that is what the driver's harness does. This is what makes HUGEINT visible:
parquet int64 survives as int64, but an uncast DuckDB `SUM(int)` returns
HUGEINT which pandas coerces to float64, rendering `144.0` vs `144` and
diverging the hash. The round-8 local checker hashed `fetchall()` (Python
ints, no coercion) and therefore said 343/350 while the driver said 321/350.

Guards added with the rewrite (VERDICT r8 items 3 and 7):
  * the DuckDB oracle result schema is rejected wholesale if it contains
    HUGEINT / UHUGEINT, any LIST/STRUCT/MAP, or DECIMAL — the three
    pandas-hostile type families;
  * a dtype-parity assertion: per column, the oracle's pandas dtype must
    equal the Spark parquet's pandas dtype;
  * object-dtype cells holding list/ndarray values fail loudly on either
    side (pandas `sort_values` cannot lexsort them — the driver errors);
  * stale-verify freshness check: the verify dir must be newer than the
    testdata it is compared against.
"""
import sys, json, glob, os, hashlib
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# DuckDB type families pandas cannot round-trip faithfully. HUGEINT → float64
# (precision loss + `144.0` rendering); LIST/STRUCT/MAP → unsortable ndarray
# cells; DECIMAL → object of decimal.Decimal (renders unlike Spark's double).
HOSTILE_TYPE_MARKERS = ("HUGEINT", "DECIMAL", "LIST", "STRUCT", "MAP", "[]")


def hostile_types(con, sql):
    """Column names of `sql`'s DuckDB result whose declared type pandas
    cannot faithfully represent. Uses DESCRIBE so nothing is executed."""
    bad = []
    for row in con.execute(f"DESCRIBE {sql}").fetchall():
        name, typ = row[0], row[1].upper()
        if any(m in typ for m in HOSTILE_TYPE_MARKERS):
            bad.append(f"{name}:{row[1]}")
    return bad


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if v is pd.NaT:
        return "NULL"
    return str(v)


def df_canon(df):
    """Hash a pandas frame the driver's way: columns sorted by name, rows
    lexsorted by pandas on the typed values, cells rendered from the
    pandas-coerced Python scalars. Raises TypeError on list-typed cells,
    mirroring the driver's `sort_values` failure."""
    cols = sorted(df.columns)
    df = df[cols]
    for c in cols:
        if df[c].dtype == object:
            bad = df[c].map(lambda v: isinstance(v, (list, np.ndarray)))
            if bad.any():
                raise TypeError(f"column {c} holds list-typed cells "
                                f"(unsortable in pandas — driver errors)")
    if len(df):
        df = df.sort_values(by=cols, kind="mergesort", na_position="last")
    h = hashlib.sha256()
    # .tolist() converts numpy scalars to Python ones: int64 -> int ("144"),
    # float64 -> float (repr -> "144.0") — exactly the driver's rendering gap.
    mat = [df[c].tolist() for c in cols]
    for i in range(len(df)):
        h.update("\x1f".join(norm_cell(mat[j][i])
                             for j in range(len(cols))).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def first_diff(gdf, edf):
    cols = sorted(gdf.columns)
    g = sorted(tuple(norm_cell(v) for v in row)
               for row in gdf[cols].itertuples(index=False, name=None))
    e = sorted(tuple(norm_cell(v) for v in row)
               for row in edf[cols].itertuples(index=False, name=None))
    for a, b in zip(g, e):
        if a != b:
            return a, b
    return None, None


def main(out_dir, sf_dir, only):
    con = duckdb.connect()
    newest_data = 0.0
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
            newest_data = max(newest_data, os.path.getmtime(p))
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    if only:
        names = [n for n in names if n in only]
    n_pass = n_fail = 0
    stale = 0
    for name in names:
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet output")
            n_fail += 1
            continue
        if max(os.path.getmtime(f) for f in files) < newest_data:
            stale += 1
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracles:
            print(f"rows-only {name}: {len(got)} rows (no oracle)")
            continue
        try:
            bad = hostile_types(con, oracles[name])
            if bad:
                print(f"FAIL {name}: pandas-hostile oracle output types "
                      f"{bad} — cast to BIGINT/DOUBLE or flatten")
                n_fail += 1
                continue
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"FAIL {name}: columns {sorted(got.columns)} != "
                  f"{sorted(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
            continue
        # Dtype parity. Same-kind integer width differences (int32 vs int64)
        # render identically in the driver's str() pass, so they are loud
        # warnings, not failures; everything else (int vs float, object vs
        # numeric) WILL diverge the driver hash and fails here.
        hard_diff, soft_diff = [], []
        for c in sorted(got.columns):
            gd, ed = got[c].dtype, exp[c].dtype
            if gd == ed:
                continue
            msg = f"{c}: spark={gd} oracle={ed}"
            if gd.kind == ed.kind and gd.kind in "iu":
                soft_diff.append(msg)
            else:
                hard_diff.append(msg)
        if soft_diff:
            print(f"WARN {name}: integer-width dtype drift "
                  f"({'; '.join(soft_diff)}) — renders identically today, "
                  f"align the casts anyway")
        if hard_diff:
            print(f"FAIL {name}: dtype parity: {'; '.join(hard_diff)}")
            n_fail += 1
            continue
        try:
            hg, he = df_canon(got), df_canon(exp)
        except TypeError as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if hg != he:
            a, b = first_diff(got, exp)
            print(f"FAIL {name}: hash mismatch over {len(got)} rows")
            if a is not None:
                print(f"  got: {a}\n  exp: {b}")
            n_fail += 1
        else:
            print(f"PASS {name}: {len(got)} rows")
            n_pass += 1
    if stale:
        print(f"WARNING: {stale} verify outputs are OLDER than the testdata "
              f"parquet under {sf_dir} — re-run graft.Verify before trusting "
              f"this gate")
    print(f"\n{n_pass} pass, {n_fail} fail, {len(names)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
