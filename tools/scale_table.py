#!/usr/bin/env python3
"""Emit the SCALE.md scaling-curve table from two filtered Bench records.

Usage: scale_table.py <sf01.json> <sf1.json> [rows_factor=10]

Exponent: time scales ~ rows^e between the two runs, e = log(t1/t0)/log(f).
e <= 1 is linear-or-better; the table names each query's expected shape so
anything super-linear beyond its stated contract stands out.
"""
import json, math, sys

EXPECTED = {
    "dedup_minhash":       ("~linear", "banded LSH; candidates ~ true pairs (linear by replica isomorphism)"),
    "dedup_prefix_join":   ("~linear", "prefix postings ~ (1-t)*shingle volume; verify ~ candidates"),
    "dedup_winnowing":     ("~linear", "fingerprints ~ grams/w; df-capped postings"),
    "pipeline_exact_dedup":("~linear", "composition: digest agg + prefix-join stage dominates"),
    "linkage_ed1":         ("~linear", "(len+1)*N postings; candidates signature-bucket bounded"),
    "linkage_sorted":      ("~linear", "range-partitioned rank + window-halo equi-join"),
    "graph_pagerank":      ("~linear", "per-round edge join+agg, fixed rounds"),
    "graph_hits":          ("~linear", "per-half-round edge shuffle, fixed rounds"),
    "graph_closeness":     ("~linear", "seeded frontier expansion, fixed rounds"),
    "view_ivm":            ("~linear", "epoch cost ~ delta size; batches scale with corpus"),
    "view_join_ivm":       ("~linear", "delta-join: dL*Rs + Ls*dR + dL*dR"),
    "view_chain_ivm":      ("~linear", "cascaded deltas through the view DAG"),
    "pipeline_pretrain":   ("~linear", "five map/agg stages, each one corpus pass"),
    "knn_brute":           ("~linear", "queries fixed (k-row broadcast); corpus scan scales"),
    "feature_ecdf":        ("~linear", "distinct-value histogram + distributed prefix sum (r10 fix)"),
    "drift_ks":            ("~linear", "two histograms + distributed prefix sums (r10 fix)"),
    "orders_gini":         ("~linear", "revenue histogram + distributed prefix sum (r10 fix)"),
}

def main():
    a = json.load(open(sys.argv[1]))["queries"]
    b = json.load(open(sys.argv[2]))["queries"]
    f = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    rows = []
    for q in sorted(set(a) & set(b)):
        t0, t1 = a[q], b[q]
        e = math.log(t1 / t0) / math.log(f) if t0 > 0 else float("nan")
        exp, why = EXPECTED.get(q, ("?", ""))
        rows.append((q, t0, t1, t1 / t0, e, exp, why))
    print("| query | sf0.1 (s) | sf1 (s) | ratio | exponent | contract | shape |")
    print("|---|---|---|---|---|---|---|")
    for q, t0, t1, r, e, exp, why in rows:
        flag = " **(!)**" if e > 1.15 else ""
        print(f"| `{q}` | {t0:.2f} | {t1:.2f} | {r:.1f}x | {e:.2f}{flag} | {exp} | {why} |")

if __name__ == "__main__":
    main()
