#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py [sfDir] [outDir] [--skip-verify]

1. Runs `sbt "runMain graft.Verify <sfDir> <outDir>"` (unless --skip-verify),
   which writes one parquet dir per registered query plus oracle_sql.json.
2. Registers every testdata table as a DuckDB view over the same parquet.
3. Runs each oracle SQL and compares against the Spark result:
   columns sorted by name, rows compared in order, exact value equality
   (floats compared exactly — the query contract is that outputs are
   engine-independent).
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    if "--help" in sys.argv or "-h" in sys.argv:
        print(__doc__)
        return
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    out_dir = args[1] if len(args) > 1 else "/tmp/verify_out"
    if "--skip-verify" not in sys.argv:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sf_dir} {out_dir}'],
            cwd="/root/repo", capture_output=True, text=True)
        if r.returncode != 0:
            print(r.stdout[-4000:])
            print(r.stderr[-4000:])
            sys.exit("Verify failed")
        for line in r.stdout.splitlines():
            if "[verify]" in line:
                print(line)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    spark_outs = {p.name for p in Path(out_dir).iterdir() if p.is_dir()}

    n_pass = n_fail = 0
    no_oracle = sorted(spark_outs - set(oracle))
    for name in sorted(spark_outs):
        if name not in oracle:
            continue
        try:
            duck_rel = con.sql(oracle[name])
            duck = duck_rel.fetchall()
            duck_cols = list(duck_rel.columns)
            duck_types = [str(t) for t in duck_rel.types]
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark = spark_rel.fetchall()
            spark_cols = list(spark_rel.columns)
            spark_types = [str(t) for t in spark_rel.types]
        except Exception as e:
            print(f"FAIL {name}: query error: {e}")
            n_fail += 1
            continue

        if sorted(duck_cols) != sorted(spark_cols):
            print(f"FAIL {name}: columns differ: duck={sorted(duck_cols)} spark={sorted(spark_cols)}")
            n_fail += 1
            continue
        # Type-strict: the driver hashes TYPED values, so a DuckDB HUGEINT
        # (bare SUM over BIGINT) vs Spark BIGINT fails there even when the
        # Python values compare equal. Mirror that here.
        dtyp = {c: t for c, t in zip(duck_cols, duck_types)}
        styp = {c: t for c, t in zip(spark_cols, spark_types)}
        typ_bad = [(c, dtyp[c], styp[c]) for c in sorted(duck_cols)
                   if dtyp[c] != styp[c]]
        if typ_bad:
            print(f"FAIL {name}: column types differ (duck vs spark): {typ_bad}")
            n_fail += 1
            continue
        # reorder both to sorted column order
        dperm = [duck_cols.index(c) for c in sorted(duck_cols)]
        sperm = [spark_cols.index(c) for c in sorted(spark_cols)]
        drows = [tuple(r[i] for i in dperm) for r in duck]
        srows = [tuple(r[i] for i in sperm) for r in spark]
        if len(drows) != len(srows):
            print(f"FAIL {name}: row count duck={len(drows)} spark={len(srows)}")
            n_fail += 1
            continue
        bad = None
        for i, (dr, sr) in enumerate(zip(drows, srows)):
            if not rows_eq(dr, sr):
                bad = (i, dr, sr)
                break
        if bad:
            print(f"FAIL {name}: first mismatch at row {bad[0]}:\n  duck ={bad[1]}\n  spark={bad[2]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(srows)} rows)")
            n_pass += 1

    print(f"\n{n_pass} passed, {n_fail} failed, {len(no_oracle)} rows-only (no oracle): {no_oracle}")
    sys.exit(1 if n_fail else 0)


def rows_eq(a, b):
    if len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if isinstance(x, float) and isinstance(y, float):
            if math.isnan(x) and math.isnan(y):
                continue
            if x != y:
                return False
        elif x != y:
            return False
    return True


if __name__ == "__main__":
    main()
