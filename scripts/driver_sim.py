"""Simulate the driver's verify pass against __spark_entry__.py.

Runs entry(spark) at sf0.001 (smoke), then every queries() entry at
sf0.01 side-by-side with its oracle_sql() via DuckDB: row count, sorted
column names, and an order-insensitive normalized value comparison —
the same contract CORRECTNESS_r{N}.json records.

Usage: python scripts/driver_sim.py [query_name ...]
"""

from __future__ import annotations

import datetime
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CHECK = "/root/testdata/sf0.01"


def norm_cell(v):
    import decimal

    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    # Floats and ints are TAGGED so 744.0 != 744: the real driver hashes
    # string-rendered cells ("744.0" vs "744"), while bare Python ==
    # would silently unify them (this is exactly how the r03/r04
    # ts_token_stats HUGEINT->float64 drift slipped past this script).
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return ("f", round(f, 9) if math.isfinite(f) else f)
    if isinstance(v, (np.integer, int)):
        return ("i", int(v))
    if isinstance(v, decimal.Decimal):
        # Spark DECIMAL -> pandas object(Decimal); DuckDB DECIMAL ->
        # float64. Render drift is real on the driver too -> keep the
        # exact value but a distinct tag so a decimal-vs-double column
        # is flagged rather than unified.
        return ("d", str(v))
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, np.ndarray, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def main() -> None:
    import duckdb

    os.environ.setdefault(
        "SPARK_GRAFT_SCRATCH", f"/root/repo/.scratch/dsim-{os.getpid()}"
    )
    import __spark_entry__ as entrymod
    from fuzzy_item_matching_spark.tables import TABLE_NAMES, table_path

    only = set(sys.argv[1:])
    # Deliberately a BARE session (not the repo's get_spark): the real
    # driver builds its own SparkSession without the repo's confs, so
    # any query that silently depends on a build-time conf must fail
    # here too (caught round-2: nanosAsLong drift masked by get_spark).
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )

    t0 = time.monotonic()
    rows = entrymod.entry(spark).collect()
    print(f"[t1 smoke] entry() -> {len(rows)} rows in {time.monotonic()-t0:.1f}s "
          f"{'PASS' if len(rows) >= 0 else 'FAIL'}")

    con = duckdb.connect()
    for name in TABLE_NAMES:
        p = table_path(SF_CHECK, name)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name in sorted(queries):
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = queries[name](spark, SF_CHECK).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"  {name}: SPARK ERROR {e}")
            n_fail += 1
            continue
        finally:
            # operator-internal persists are per-query; drop them so a
            # 70-query loop doesn't accumulate cached blocks
            spark.catalog.clearCache()
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"  {name}: rows-only ({len(sdf)} rows, {dt:.1f}s)")
            n_rows_only += 1
            continue
        try:
            ddf = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"  {name}: ORACLE ERROR {e}")
            n_fail += 1
            continue
        ok = True
        if sorted(sdf.columns) != sorted(ddf.columns):
            print(f"  {name}: SCHEMA MISMATCH spark={sorted(sdf.columns)} "
                  f"duck={sorted(ddf.columns)}")
            ok = False
        elif len(sdf) != len(ddf):
            print(f"  {name}: ROWCOUNT MISMATCH spark={len(sdf)} duck={len(ddf)}")
            ok = False
        else:
            cols = sorted(sdf.columns)
            srows = sorted((tuple(norm_cell(v) for v in r)
                            for r in sdf[cols].itertuples(index=False)), key=repr)
            drows = sorted((tuple(norm_cell(v) for v in r)
                            for r in ddf[cols].itertuples(index=False)), key=repr)
            for i, (a, b) in enumerate(zip(srows, drows)):
                if a != b:
                    print(f"  {name}: VALUE MISMATCH row {i}\n    spark: {a}\n    duck : {b}")
                    ok = False
                    break
        if ok:
            print(f"  {name}: PASS ({len(sdf)} rows, {dt:.1f}s)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"[t2] pass={n_pass} rows_only={n_rows_only} fail={n_fail}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
