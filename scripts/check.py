#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"`,
run  `python3 scripts/check.py /root/testdata/sf0.01 /tmp/verify_out`.

For each query in oracle_sql.json: runs the oracle SQL in DuckDB (tables
registered as views over the sf dir), reads the Spark-written parquet,
sorts columns by name (driver does the same before hashing) and compares
row count, schema, and exact values. Floats report max abs diff when not
bit-identical so near-misses are diagnosable.
"""
import duckdb, json, os, sys, glob

import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single-file parquet; Spark-written
        # replicas (graft.tools.ReplicateSf) are DIRECTORIES of parts
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # optional resume: skip queries up to and including argv[3]
    # (long sf1 replays interrupted by an oracle rewrite pick up where
    # they stopped; the skipped prefix's verdicts come from the prior log)
    start_after = sys.argv[3] if len(sys.argv) > 3 else ""
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if start_after and name <= start_after:
            continue
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            # a 0-row Spark result can legitimately write a directory
            # with only _SUCCESS (no part files, AQE); it matches an
            # oracle that is ALSO empty — anything else is a failure.
            # The _SUCCESS marker is REQUIRED: a query that crashed
            # after creating the directory but before committing parts
            # must not score a 0-row PASS (r15 ADVICE)
            if os.path.isdir(f"{outdir}/{name}") and \
                    os.path.exists(f"{outdir}/{name}/_SUCCESS"):
                try:
                    du0 = con.sql(oracle[name]).df()
                except Exception as e:
                    print(f"FAIL {name}: {e}")
                    n_fail += 1
                    continue
                if len(du0) == 0:
                    n_pass += 1
                    print(f"PASS {name} (0 rows, partless dir)")
                else:
                    n_fail += 1
                    print(f"FAIL {name}: spark empty, oracle {len(du0)} rows")
                continue
            print(f"FAIL {name}: no spark output parquet")
            n_fail += 1
            continue
        try:
            sp = con.sql(f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
            rel = con.sql(oracle[name])
            # permanent type lint: DuckDB promotes sum(BIGINT) to HUGEINT,
            # and the driver's hash is type-tagged — an INT128 column can
            # never hash-match Spark's int64 even with identical values
            # (the sole cause of 3 rounds of phantom red rows, r5-r7).
            # Fail loudly here so an uncasted aggregate can't ship.
            bad_types = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                         if str(t).upper() in ("HUGEINT", "INT128", "UHUGEINT")]
            if bad_types:
                print(f"FAIL {name}: oracle emits HUGEINT column(s) "
                      f"{bad_types} — wrap in CAST(... AS BIGINT)")
                n_fail += 1
                continue
            du = rel.df()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        sp = sp[sorted(sp.columns)]
        du = du[sorted(du.columns)]
        errs = []
        if list(sp.columns) != list(du.columns):
            errs.append(f"cols spark={list(sp.columns)} oracle={list(du.columns)}")
        elif len(sp) != len(du):
            errs.append(f"rows spark={len(sp)} oracle={len(du)}")
        else:
            for c in sp.columns:
                a, b = sp[c], du[c]
                if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                    av, bv = a.astype(float).values, b.astype(float).values
                    same = (av == bv) | (np.isnan(av) & np.isnan(bv))
                    if not same.all():
                        d = np.nanmax(np.abs(av - bv))
                        errs.append(f"col {c}: {np.count_nonzero(~same)} diffs, maxabs={d:.3e}")
                else:
                    if str(a.dtype) != str(b.dtype):
                        errs.append(f"col {c}: dtype {a.dtype} vs {b.dtype}")
                        continue
                    same = (a.values == b.values) | (pd.isna(a).values & pd.isna(b).values)
                    if not np.asarray(same).all():
                        i = int(np.argmax(~np.asarray(same)))
                        errs.append(f"col {c}: {np.count_nonzero(~np.asarray(same))} diffs, first@{i}: {a.iloc[i]!r} vs {b.iloc[i]!r}")
        if errs:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(errs))
        else:
            n_pass += 1
            print(f"PASS {name} ({len(sp)} rows)")
    # queries registered without an oracle still need to produce output
    extra = sorted(set(glob.glob(f"{outdir}/*/")) )
    noracle = [p.rstrip("/").rsplit("/", 1)[-1] for p in extra
               if p.rstrip("/").rsplit("/", 1)[-1] not in oracle]
    n_ronly = 0
    for name in noracle:
        try:
            n = con.sql(f"SELECT count(*) FROM read_parquet('{outdir}/{name}/*.parquet')").fetchone()[0]
            print(f"INFO {name}: no oracle, {n} rows")
            n_ronly += 1
        except Exception as e:
            n_fail += 1
            print(f"FAIL {name}: rows-only read failed: {e}")
    # Census #10 at gate scale: Verify's per-query ORDER-BY totality
    # verdicts (sort-key tuple is a key of the output / provably
    # single-row / reviewed pin). A "keys" entry with violations > 0
    # means tie order is engine-dependent AT THIS SCALE even if the
    # value compare above passed by scan-order luck — the exact class
    # the sf10 gate caught in r16 (q02: 5,400 tied rows of 1.11M).
    n_tviol = 0
    tot_path = f"{outdir}/sort_totality.json"
    if os.path.exists(tot_path):
        tot = json.load(open(tot_path))
        for name in sorted(tot):
            if start_after and name <= start_after:
                continue
            v = tot[name]
            if v["status"] == "keys" and v["violations"] > 0:
                n_tviol += 1
                print(f"TOTALITY {name}: {v['violations']} tied group(s) "
                      f"under ORDER BY {v['keys']}")
            elif v["status"] == "single_row" and v["rows"] > 1:
                n_tviol += 1
                print(f"TOTALITY {name}: single-row proof lied ({v['rows']} rows)")
            elif v["status"] == "breach" and not v.get("pinned"):
                n_tviol += 1
                print(f"TOTALITY {name}: structural breach — {v['detail']}")
        if n_tviol:
            print(f"== ORDER-BY totality: {n_tviol} violation(s) ==")
    print(f"== {n_pass} pass / {n_fail} fail / {n_ronly} rows-only / "
          f"{n_tviol} totality-violations ==")
    sys.exit(1 if (n_fail or n_tviol) else 0)

if __name__ == "__main__":
    main()
