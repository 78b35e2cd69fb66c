#!/usr/bin/env python3
"""Cross-engine scalar-function fuzz compare (round 12).

Usage: after `sbt "runMain graft.FuzzScalars /tmp/fuzz_out"`, run
`python3 scripts/fuzz_scalars.py /tmp/fuzz_out`.

For each pair in fuzz_sql.json: evaluates the DuckDB spelling over the
shared fuzz_input parquet and compares, row by id, against the Spark
column in fuzz_spark parquet. Policies:
  exact — bitwise value equality (NaN==NaN, NULL==NULL)
  ulp:N — floats may differ by up to N units in the last place
          (transcendental functions: the JVM's and DuckDB's libm may
          legitimately round the last bit differently; the report
          prints the WORST ulp observed so the band is measured)

Exit 0 iff every pair passes. FAIL lines print up to 3 diverging rows
with the raw fixture inputs so a divergence is reproducible in one
spark-shell / duckdb call.
"""
import duckdb, json, sys

import numpy as np
import pandas as pd


def ulps_apart(a, b):
    """Element-wise ulp distance between two float64 arrays (inf where
    signs/classes disagree)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    ai = a.view(np.int64).copy()
    bi = b.view(np.int64).copy()
    # map to monotone integer line: negative floats -> reflected
    ai = np.where(ai < 0, np.int64(-(2**63)) - ai - 1, ai)
    bi = np.where(bi < 0, np.int64(-(2**63)) - bi - 1, bi)
    # arbitrary-precision subtraction (int64 overflow-safe)
    return np.abs(ai.astype(object) - bi.astype(object))


def selftest():
    """Prove the comparator distinguishes a Spark NaN from a DuckDB
    NULL (the r12 ADVICE gap this script was fixed for): build an sp
    table whose float column is [1.0, NaN, NaN-standing-for-value] and
    a duck expression yielding [1.0, NaN, NULL] — row 2 must FAIL."""
    con = duckdb.connect()
    con.sql("CREATE TABLE fuzz AS SELECT * FROM (VALUES (0), (1), (2)) t(id)")
    con.sql("CREATE TABLE sp AS SELECT id, CASE WHEN id = 0 THEN 1.0::DOUBLE "
            "ELSE 'nan'::DOUBLE END AS st_probe FROM fuzz")
    pairs = {"st_probe": {
        "sql": "CASE WHEN id = 0 THEN 1.0::DOUBLE "
               "WHEN id = 1 THEN 'nan'::DOUBLE END",
        "policy": "exact"}}
    n_pass, n_fail = run_pairs(con, pairs, con.sql("SELECT * FROM fuzz").df())
    assert n_fail == 1, "NaN-vs-NULL divergence NOT detected (selftest)"
    print("SELFTEST PASS: NaN-vs-NULL divergence detected")
    sys.exit(0)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--selftest":
        selftest()
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fuzz_out"
    con = duckdb.connect()
    con.sql(f"CREATE VIEW fuzz AS SELECT * FROM "
            f"read_parquet('{outdir}/fuzz_input/*.parquet')")
    con.sql(f"CREATE VIEW sp AS SELECT * FROM "
            f"read_parquet('{outdir}/fuzz_spark/*.parquet')")
    pairs = json.load(open(f"{outdir}/fuzz_sql.json"))
    fix = con.sql("SELECT * FROM fuzz ORDER BY id").df()
    n_pass, n_fail = run_pairs(con, pairs, fix)
    print(f"== {n_pass} pass / {n_fail} fail / {len(pairs)} pairs ==")
    sys.exit(1 if n_fail else 0)


def run_pairs(con, pairs, fix):
    n_pass = n_fail = 0
    for name in pairs:
        sql, policy = pairs[name]["sql"], pairs[name]["policy"]
        try:
            du = con.sql(
                f"SELECT id, {sql} AS v FROM fuzz ORDER BY id").df()
            spq = con.sql(
                f'SELECT id, "{name}" AS v FROM sp ORDER BY id').df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        a, b = spq["v"], du["v"]
        nulls_a, nulls_b = pd.isna(a).values, pd.isna(b).values
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            # NULL and NaN are both NaN after .df() on a float column,
            # so pd.isna cannot distinguish a Spark NaN from a DuckDB
            # NULL (the r12 ADVICE gap). Fetch EXPLICIT null flags from
            # each side instead: parquet carries a validity mask, and
            # DuckDB's IS NULL over it (for the Spark output) / over
            # the recomputed expression (for its own) is NaN-proof.
            nulls_a = con.sql(
                f'SELECT id, ("{name}" IS NULL) AS n FROM sp ORDER BY id'
            ).df()["n"].values.astype(bool)
            nulls_b = con.sql(
                f"SELECT id, (({sql}) IS NULL) AS n FROM fuzz ORDER BY id"
            ).df()["n"].values.astype(bool)
            av = a.astype(float).values
            bv = b.astype(float).values
            nonnull = ~nulls_a & ~nulls_b
            both_nan = np.isnan(av) & np.isnan(bv) & nonnull
            if policy.startswith("ulp:"):
                tol = int(policy.split(":", 1)[1])
                d = ulps_apart(av, bv)
                vals_ok = ((av == bv) | both_nan | (d <= tol)) & nonnull
                worst = max((int(x) for x, o in zip(d, (av == bv) | both_nan)
                             if not o), default=0)
                tag = f" (worst ulp={worst})" if worst else ""
            else:
                vals_ok = ((av == bv) | both_nan) & nonnull
                tag = ""
            ok = vals_ok | (nulls_a & nulls_b)
        else:
            tag = ""
            ok = np.empty(len(a), dtype=bool)
            for i in range(len(a)):
                if nulls_a[i] or nulls_b[i]:
                    ok[i] = bool(nulls_a[i]) and bool(nulls_b[i])
                else:
                    ok[i] = a.iloc[i] == b.iloc[i]
        bad = np.flatnonzero(~np.asarray(ok))
        if len(bad):
            n_fail += 1
            print(f"FAIL {name} [{policy}]: {len(bad)}/{len(a)} diverge")
            for i in bad[:3]:
                row = fix.iloc[i]
                ins = {c: row[c] for c in fix.columns if c != "id"}
                print(f"  id={row['id']}: spark={a.iloc[i]!r} "
                      f"duck={b.iloc[i]!r} inputs={ins}")
        else:
            n_pass += 1
            print(f"PASS {name} [{policy}]{tag}")
    return n_pass, n_fail


if __name__ == "__main__":
    main()
