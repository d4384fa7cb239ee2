"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
(same parquet tables), then compares row count, column names, and an
order-insensitive value representation. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6f}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    if v is None:
        return "NULL"
    return str(v)


def rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    import duckdb

    from uma_etl_iis_loader_spark.session import build_session
    import __spark_entry__ as entrymod

    spark = build_session("oracle-check")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    failures = []
    n_run = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        n_run += 1
        t0 = time.time()
        sdf = fn(spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        # driver-canonicalizer simulation: the driver sorts the pandas frame
        # over ALL columns before hashing — list/dict cells are unhashable
        # there and turn the row into an `err` verdict (round-1 failure
        # mode). Reproduce that exact step so it can never regress.
        import pandas as _pd

        try:
            _pd.DataFrame(srows, columns=scols).sort_values(by=sorted(scols))
        except TypeError as e:
            print(f"  {name}: DRIVER-CANON FAIL (unhashable output col): {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"  {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s) [no oracle]")
            continue
        res = con.execute(oracles[name])
        dcols = [d[0] for d in res.description]
        drows = res.fetchall()
        ok = True
        if sorted(scols) != sorted(dcols):
            print(f"  {name}: COLUMN MISMATCH spark={sorted(scols)} "
                  f"duck={sorted(dcols)}")
            ok = False
        if len(srows) != len(drows):
            print(f"  {name}: ROWCOUNT MISMATCH spark={len(srows)} "
                  f"duck={len(drows)}")
            ok = False
        if ok:
            sset, dset = rowset(scols, srows), rowset(dcols, drows)
            if sset != dset:
                ok = False
                diffs = [
                    (a, b) for a, b in zip(sset, dset) if a != b
                ][:3]
                print(f"  {name}: VALUE MISMATCH; first diffs:")
                for a, b in diffs:
                    print(f"    spark: {a[:200]}\n    duck : {b[:200]}")
        status = "OK" if ok else "FAIL"
        print(f"  {name}: {status} ({len(srows)} rows, {time.time()-t0:.1f}s)")
        if not ok:
            failures.append(name)

    print(f"\n{n_run - len(failures)}/{n_run} queries pass at {SF_DIR}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
