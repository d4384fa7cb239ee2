"""Driver-environment simulation: run every registry query the way the
DRIVER does — a bare SparkSession with only the driver contract's own
settings (local[*], spark.sql.shuffle.partitions=32; none of
build_session's tuning — timezone/nanos handling must come from
io.read_fixture's dynamic settings) — then push each result through the
driver's pandas canonicalizer. Catches session-dependent breakage that
tools/check_oracle.py (which uses build_session) cannot.

    python tools/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])


def main() -> int:
    import pandas as pd
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    # the driver's session: plain builder, local[*], nothing else
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    failures = []
    n_run = 0
    qs = entrymod.queries()
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        n_run += 1
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            cols = sdf.columns
            rows = [tuple(r) for r in sdf.collect()]
            # the driver's canonicalization step (sort over all columns)
            pd.DataFrame(rows, columns=cols).sort_values(by=sorted(cols))
            print(f"  {name}: OK ({len(rows)} rows, {time.time()-t0:.1f}s)")
        except Exception as e:
            print(f"  {name}: FAIL {type(e).__name__}: {str(e)[:200]}")
            failures.append(name)
    print(f"\n{n_run - len(failures)}/{n_run} driver-sim pass at {SF_DIR}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
