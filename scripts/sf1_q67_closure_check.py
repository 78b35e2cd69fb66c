#!/usr/bin/env python3
"""Independent sf1 derivation check for q67_dedup_clusters (r15).

q67's DuckDB oracle is a recursive transitive closure over the
39.6M-pair jaccard block join — intrinsically hours at sf1 even with
the pair CTE materialized. This check proves the same result a
different way, from already-oracle-verified inputs (the q198
replica-check precedent):

  1. take q45_ngram_jaccard's sf1 output — the EXACT jaccard >= 0.5
     pair set, itself oracle-verified PASS at sf1 (20,496,700 rows);
  2. union-find the connected components in plain Python (no SQL
     engine involved — a third, independent implementation);
  3. expected q67 output = (doc_id, min id of its component) for every
     doc in the pair set; compare EXACTLY against Spark's parquet.

Usage: python3 scripts/sf1_q67_closure_check.py [verify_out_dir]
(defaults to /tmp/verify_sf1). Prints PASS/FAIL with counts.
"""
import sys
import collections

import duckdb
import numpy as np


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_sf1"
    con = duckdb.connect()
    df = con.sql("SELECT id_a, id_b FROM read_parquet("
                 f"'{outdir}/q45_ngram_jaccard/*.parquet')").df()
    print(f"verified pair set: {len(df)} rows")
    ids = np.unique(np.concatenate([df.id_a.values, df.id_b.values]))
    idx = {v: i for i, v in enumerate(ids)}
    parent = np.arange(len(ids))

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    a = df.id_a.map(idx).values
    b = df.id_b.map(idx).values
    for i in range(len(a)):
        ra, rb = find(a[i]), find(b[i])
        if ra != rb:
            parent[ra] = rb
    comp_min = {}
    for v, i in idx.items():
        r = find(i)
        if r not in comp_min or v < comp_min[r]:
            comp_min[r] = v
    expected = {v: comp_min[find(i)] for v, i in idx.items()}
    sizes = collections.Counter(find(i) for i in range(len(ids)))
    cs = sorted(sizes.values(), reverse=True)
    print(f"components: {len(cs)}, largest: {cs[:5]}, "
          f"sum c^2 (closure mass): {sum(c * c for c in cs)}")

    got = con.sql("SELECT doc_id, cluster_id FROM read_parquet("
                  f"'{outdir}/q67_dedup_clusters/*.parquet')").df()
    g = dict(zip(got.doc_id.values.tolist(),
                 got.cluster_id.values.tolist()))
    mismatch = sum(1 for v, c in expected.items() if g.get(v) != c)
    extra = len(set(g) - set(expected))
    # r15 ADVICE: the dict dedupes doc_id, so a multiplicity bug (a doc
    # emitted twice) would otherwise still PASS — assert the RAW row
    # count and per-doc uniqueness before declaring the gate closed
    dup_rows = len(got) - got.doc_id.nunique()
    ok = (mismatch == 0 and extra == 0 and len(g) == len(expected)
          and len(got) == len(expected) and dup_rows == 0)
    print(f"spark rows: {len(got)} (dup doc_id rows: {dup_rows}), "
          f"expected docs: {len(expected)}, "
          f"mismatches: {mismatch}, extra: {extra}")
    print("PASS q67_dedup_clusters (closure derivation)" if ok
          else "FAIL q67_dedup_clusters")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
