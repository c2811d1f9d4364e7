"""Audit pandas dtypes of every query vs its DuckDB oracle.

The driver's value hash renders cells to strings, so an int64 744 on
the Spark side vs a float64 744.0 on the oracle side hash-mismatches
even though ``744 == 744.0``. The classic source: DuckDB promotes
``SUM(BIGINT)`` to HUGEINT, which its pandas conversion renders as
float64. This script runs every oracle-bearing query at sf0.01 and
flags any column whose numpy *kind* differs between the two frames
(int vs float vs object), which is exactly the class of drift the
equality-based compare in driver_sim can't see.

Usage: python scripts/audit_dtypes.py [query_name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_CHECK = "/root/testdata/sf0.01"


def main() -> None:
    import duckdb

    import __spark_entry__ as entrymod
    from fuzzy_item_matching_spark.tables import TABLE_NAMES, table_path

    only = set(sys.argv[1:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("dtype-audit")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )

    con = duckdb.connect()
    for name in TABLE_NAMES:
        p = table_path(SF_CHECK, name)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_err = 0
    n_drift = 0
    try:
        for name in sorted(queries):
            if only and name not in only:
                continue
            sql = oracles.get(name)
            if sql is None:
                continue
            try:
                sdf = queries[name](spark, SF_CHECK).toPandas()
                odf = con.execute(sql).df()
            except Exception as e:  # noqa: BLE001
                print(f"[ERR ] {name}: {e}")
                n_err += 1
                continue
            finally:
                spark.catalog.clearCache()
                # Streaming queries run via availableNow; any sink a
                # failed query left active would outlive its slot.
                for st in spark.streams.active:
                    st.stop()
            sk = {c: sdf[c].dtype.kind for c in sdf.columns}
            ok = {c: odf[c].dtype.kind for c in odf.columns}
            drift = {
                c: (sk.get(c), ok.get(c))
                for c in sorted(set(sk) | set(ok))
                if sk.get(c) != ok.get(c)
            }
            if drift:
                n_drift += 1
                print(f"[KIND] {name}: {drift}")
    finally:
        con.close()
        spark.stop()
    print(f"[done] {n_drift} dtype drifts, {n_err} execution errors")
    if n_err:
        sys.exit(1)


if __name__ == "__main__":
    main()
