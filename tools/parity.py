#!/usr/bin/env python3
"""Local replica of the driver's t2 DuckDB compare (dev feedback loop only —
the shipped Scala library never depends on this).

Reads the graft.Verify output dir: per-query parquet + oracle_sql.json,
creates DuckDB views over the same sf dir, runs each oracle SQL, and compares
row-by-row with columns sorted by name (the driver's hash is column-name
keyed). Reports MATCH / MISMATCH with a diff sample.

Usage: tools/parity.py [sfdir] [verify_outdir] [only_query ...]
"""
import json, math, sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def eq(a, b):
    """Driver-strict compare: the driver's hash is representation-sensitive
    (round-1 lesson: Decimal('38.00') == 38.0 under python ==, but they hash
    differently). Compare (type_name, str(value)) so local green == driver
    green."""
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
    return (type(a).__name__, str(a)) == (type(b).__name__, str(b))


def main():
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")
    only = set(sys.argv[3:])

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

    oracle = json.loads((outdir / "oracle_sql.json").read_text())
    failures = []
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        pq = outdir / name
        if not pq.exists():
            print(f"FAIL  {name}: no Spark output dir")
            failures.append(name)
            continue
        try:
            spark_rows = con.execute(
                f"SELECT * FROM '{pq}/*.parquet'").fetchall()
            spark_cols = [d[0] for d in con.description]
            duck = con.execute(sql)
            duck_cols = [d[0] for d in duck.description]
            duck_rows = duck.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: {e}")
            failures.append(name)
            continue
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL  {name}: columns differ spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
            failures.append(name)
            continue
        # driver sorts columns by name before hashing
        s_ix = [spark_cols.index(c) for c in sorted(spark_cols)]
        d_ix = [duck_cols.index(c) for c in sorted(duck_cols)]
        s = [tuple(r[i] for i in s_ix) for r in spark_rows]
        dk = [tuple(r[i] for i in d_ix) for r in duck_rows]
        if len(s) != len(dk):
            print(f"FAIL  {name}: row count spark={len(s)} duck={len(dk)}")
            failures.append(name)
            continue
        bad = None
        for i, (ra, rb) in enumerate(zip(s, dk)):
            if not all(eq(a, b) for a, b in zip(ra, rb)):
                bad = (i, ra, rb)
                break
        if bad:
            i, ra, rb = bad
            print(f"FAIL  {name}: first diff at row {i}")
            print(f"      cols : {sorted(spark_cols)}")
            print(f"      spark: {ra}")
            print(f"      duck : {rb}")
            failures.append(name)
        else:
            print(f"OK    {name}: {len(s)} rows")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {' '.join(failures)}")
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
