#!/usr/bin/env python3
"""Exact sf1 verification for q198_prefix_join via replica derivation.

The sf1 replay data (graft.tools.ReplicateSf) is 10 key-shifted,
referentially-intact copies of sf0.1, so q198's sf1 output is fully
determined by its (oracle-verified) sf0.1 output: identical texts have
identical 5-gram sets, hence

  expected(sf1) =
      { (a + r1*S, b + r2*S, inter, union, jppm)       # cross/els pairs
        for each sf0.1 pair (a, b, inter, union, jppm)
        for r1, r2 in 10x10, normalized to (min, max) }
    U { (d + r1*S, d + r2*S, len_d, len_d, 1000000)    # replica self-pairs
        for each eligible doc d (>= one 5-gram), r1 < r2 }

where S = max(sf0.1 doc_id) + 1. The all-pairs DuckDB oracle is
infeasible at sf1 (measured: 19.7e9 gram-pair mass / 250e6 raw pairs —
see PERF.md round 14); this derivation is EXACT, not a relaxation: it
leans on the sf0.1 gate for the base pairs and on replica identity for
the rest.

Usage: python3 scripts/sf1_q198_replica_check.py \
           /root/testdata/sf0.1 /tmp/graft_sf1 /tmp/verify_sf1
"""
import sys

import duckdb

BASE_ORACLE = r"""
WITH d AS (SELECT doc_id, lang,
    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS n
  FROM documents),
s AS (SELECT doc_id, lang, list_distinct(list_transform(
    range(1, length(n) - 3),
    i -> substring(n, i, 5))) AS gs FROM d
  WHERE length(n) >= 5),
o AS (SELECT doc_id, lang, gs, CAST(len(gs) AS BIGINT) AS len FROM s),
v AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(len(list_intersect(a.gs, b.gs)) AS BIGINT) AS inter_sz,
        CAST(a.len + b.len - len(list_intersect(a.gs, b.gs))
          AS BIGINT) AS union_sz
      FROM o a JOIN o b
        ON a.lang = b.lang AND a.doc_id < b.doc_id)
SELECT id_a, id_b, inter_sz, union_sz,
  inter_sz * 1000000 // union_sz AS jac_ppm
FROM v WHERE inter_sz * 5 >= 4 * union_sz
ORDER BY id_a, id_b"""

ELIGIBLE = r"""
SELECT doc_id, CAST(len(list_distinct(list_transform(
    range(1, length(n) - 3), i -> substring(n, i, 5)))) AS BIGINT) AS len
FROM (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS n
      FROM documents)
WHERE length(n) >= 5"""


def main():
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    sf1 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/verify_sf1"
    n_rep = int(sys.argv[4]) if len(sys.argv) > 4 else 10

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{base}/documents.parquet')")
    span = con.sql("SELECT max(doc_id) + 1 FROM documents").fetchone()[0]
    pairs = con.sql(BASE_ORACLE).fetchall()
    elig = con.sql(ELIGIBLE).fetchall()
    print(f"sf0.1 base: {len(pairs)} pairs, {len(elig)} eligible docs, "
          f"span={span}")

    expected = set()
    for a, b, i, u, j in pairs:
        for r1 in range(n_rep):
            for r2 in range(n_rep):
                x, y = a + r1 * span, b + r2 * span
                expected.add((min(x, y), max(x, y), i, u, j))
    for d, ln in elig:
        for r1 in range(n_rep):
            for r2 in range(r1 + 1, n_rep):
                expected.add((d + r1 * span, d + r2 * span, ln, ln, 1000000))

    got = set(map(tuple, con.sql(
        f"SELECT id_a, id_b, inter_sz, union_sz, jac_ppm FROM "
        f"read_parquet('{out}/q198_prefix_join/*.parquet')").fetchall()))
    missing = expected - got
    extra = got - expected
    print(f"sf1 spark output: {len(got)} rows; expected: {len(expected)}")
    if missing or extra:
        print(f"FAIL q198 sf1 replica check: missing={len(missing)} "
              f"extra={len(extra)}")
        for r in list(missing)[:5]:
            print("  missing:", r)
        for r in list(extra)[:5]:
            print("  extra:", r)
        sys.exit(1)
    print("PASS q198 sf1 replica check (exact set + values)")


if __name__ == "__main__":
    main()
