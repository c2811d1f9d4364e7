"""Source/sink queries (SURVEY §2.A): CSV scan with explicit schema,
parquet write/read-back, seeded sampling, caching.

Side-effecting writes land under ``/root/repo/.scratch`` (gitignored);
each query is deterministic end-to-end so oracles still hold.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from fuzzy_item_matching_spark.queries import query
from fuzzy_item_matching_spark.tables import load_table

# Per-process override so concurrent engine processes (bench + driver
# + tests) never share side-effect paths: a fixed checkpoint or
# versioned-table dir written by two JVMs at once can wedge a
# streaming drain or corrupt a manifest. Harness scripts set
# SPARK_GRAFT_SCRATCH to a unique subdir before importing the engine.
SCRATCH = os.environ.get("SPARK_GRAFT_SCRATCH", "/root/repo/.scratch")


@query(
    "src_csv_roundtrip",
    oracle="""
    SELECT r.r_name, COUNT(*) AS n_nations,
           MIN(n.n_name) AS first_nation
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def src_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: CSV written then re-read with a handwritten StructType —
    the reference's explicit-schema CSV ingest
    (`01_Feature Engineering.py:54-65`). The round-trip proves schema
    fidelity (ids stay ints); the join+agg proves the values survived."""
    os.makedirs(SCRATCH, exist_ok=True)
    path = os.path.join(SCRATCH, "nation_csv")
    n = load_table(spark, sf_dir, "nation")
    n.select("n_nationkey", "n_name", "n_regionkey").write.mode("overwrite").csv(
        path, header=True
    )
    schema = StructType(
        [
            StructField("n_nationkey", IntegerType()),
            StructField("n_name", StringType()),
            StructField("n_regionkey", IntegerType()),
        ]
    )
    n2 = spark.read.csv(path, header=True, schema=schema)
    r = load_table(spark, sf_dir, "region")
    return (
        n2.join(F.broadcast(r), n2.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_nations"),
            F.min("n_name").alias("first_nation"),
        )
    )


@query(
    "src_parquet_write_read",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def src_parquet_write_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: filtered orders written to parquet (overwrite) and read
    back — the reference's Delta write/scan cycle
    (`01_Feature Engineering.py:66-75`) on plain parquet. The filter
    happens before the write; the read-back scan sees only 'F' rows
    (partition-pruned storage layout is the 100 TB analogue)."""
    os.makedirs(SCRATCH, exist_ok=True)
    path = os.path.join(SCRATCH, "orders_f_parquet")
    o = load_table(spark, sf_dir, "orders")
    o.filter(F.col("o_orderstatus") == "F").write.mode("overwrite").parquet(path)
    return (
        spark.read.parquet(path)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


@query("src_seeded_sample", oracle=None)  # Bernoulli sampling is
# engine-specific (Spark's XORShiftRandom) — rows-only here, with
# determinism + fraction properties in tests/test_sources.py
def src_seeded_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7+S8: seeded sample of lineitem, cached, then aggregated — the
    reference's `.sample(0.01).cache()` incremental-simulation pattern
    (`03_Train & Deploy Model.py:455`). Same seed → same rows within
    Spark; the sample is taken per-partition with no shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    s = li.sample(fraction=0.1, seed=42).cache()
    return s.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("qty"),
    )


@query(
    "src_partitioned_prune",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def src_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned layout + partition-pruned scan — the 100 TB table
    design primitive: orders written hive-style partitioned by
    o_orderstatus, read back with a partition-column filter so the
    scan plans only the matching directory (PartitionFilters in the
    plan, asserted in tests/test_plans.py; at scale this is the
    difference between reading one partition and the whole table)."""
    os.makedirs(SCRATCH, exist_ok=True)
    path = os.path.join(SCRATCH, "orders_by_status")
    o = load_table(spark, sf_dir, "orders")
    o.write.partitionBy("o_orderstatus").mode("overwrite").parquet(path)
    return (
        spark.read.parquet(path)
        .filter(F.col("o_orderstatus") == "O")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


@query(
    "src_archive_ingest",
    oracle="""
    WITH a(id, name, price) AS (
      VALUES (1, 'alpha kettle', 12.50), (2, 'beta toaster', 30.00),
             (3, 'gamma blender', 45.25)
    ),
    b(id, name, price) AS (
      VALUES (10, 'alpha kettle deluxe', 14.00), (11, 'delta mixer', 52.75)
    )
    SELECT src, COUNT(*) AS n,
           CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM (SELECT 'a' AS src, * FROM a UNION ALL SELECT 'b', * FROM b)
    GROUP BY src
    """,
)
def src_archive_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 — the reference's bronze-ingest step (wget + unzip of
    Abt-Buy.zip, `EXTRACT:2-7`) as a network-free local analogue:
    archive → extract → CSV scan with explicit schema → bronze parquet
    → source-tagged union (P4) → aggregate. The archive step is
    driver-side setup (exactly like the reference's shell cell);
    everything after the extracted CSVs is the engine's S1/S2/U1 path.
    At scale ingest parallelism comes from many archives mapped across
    executors — the per-archive flow is what's exercised here."""
    import zipfile

    os.makedirs(SCRATCH, exist_ok=True)
    zpath = os.path.join(SCRATCH, "bronze_ingest.zip")
    exdir = os.path.join(SCRATCH, "bronze_extract")
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr(
            "a.csv",
            "id,name,price\n1,alpha kettle,12.50\n2,beta toaster,30.00\n"
            "3,gamma blender,45.25\n",
        )
        z.writestr(
            "b.csv",
            "id,name,price\n10,alpha kettle deluxe,14.00\n11,delta mixer,52.75\n",
        )
    with zipfile.ZipFile(zpath) as z:
        z.extractall(exdir)

    schema = StructType(
        [
            StructField("id", IntegerType()),
            StructField("name", StringType()),
            StructField("price", StringType()),  # cast below, like P3
        ]
    )
    bronze = os.path.join(SCRATCH, "bronze_parquet")
    frames = []
    for src in ("a", "b"):
        df = (
            spark.read.csv(
                os.path.join(exdir, f"{src}.csv"), header=True, schema=schema
            )
            .withColumn("src", F.lit(src))
        )
        df.write.mode("overwrite").parquet(os.path.join(bronze, src))
        frames.append(spark.read.parquet(os.path.join(bronze, src)))
    allrows = frames[0].unionByName(frames[1])
    return allrows.groupBy("src").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("price").cast("decimal(18,2)")).cast("double").alias(
            "total_price"
        ),
    )


_D_U = (
    "(CAST(CAST('0x' || substr(md5('42:' || CAST({key} AS VARCHAR)), 1, 8)"
    " AS BIGINT) AS DOUBLE) / 4294967296.0)"
)


@query(
    "src_keyed_sample",
    oracle=f"""
    SELECT l_returnflag, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
    FROM lineitem
    WHERE {_D_U.format(key="l_orderkey || '|' || l_linenumber")} < 0.1
    GROUP BY l_returnflag
    """,
)
def src_keyed_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7, the reproducible form: content-keyed Bernoulli sample —
    u = f(md5(seed:key)) per row, so the SAME rows are sampled on any
    partitioning, cluster size, or engine (Spark's .sample draws per
    partition and is reproducible only within one physical plan; it
    stays demonstrated by src_seeded_sample). Exactly SQL-replicable →
    full oracle. At 100 TB this is how eval/holdout sets stay stable
    across reruns."""
    from fuzzy_item_matching_spark.functions.sampling import keyed_sample

    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws("|", "l_orderkey", "l_linenumber")
    return keyed_sample(li, key, fraction=0.1, seed=42).groupBy(
        "l_returnflag"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("qty"),
    )


@query(
    "src_orc_roundtrip",
    oracle="""
    SELECT p_brand, COUNT(*) AS n,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
           MIN(p_name) AS first_name
    FROM part WHERE p_size >= 25
    GROUP BY p_brand
    """,
)
def src_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S2 on the ORC format: filtered parts written as ORC
    (overwrite) and read back through the vectorized ORC reader —
    exercises the second columnar container Spark ships natively (a
    100 TB lake is rarely one format). Predicate applied before the
    write; the read-back agg proves values and types survived the
    format hop (DECIMAL sum keeps the float agg order-insensitive)."""
    os.makedirs(SCRATCH, exist_ok=True)
    path = os.path.join(SCRATCH, "part_orc")
    p = load_table(spark, sf_dir, "part")
    p.filter(F.col("p_size") >= 25).write.mode("overwrite").orc(path)
    return (
        spark.read.orc(path)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("p_retailprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
            F.min("p_name").alias("first_name"),
        )
    )


@query(
    "src_jsonl_roundtrip",
    oracle="""
    SELECT s_nationkey, COUNT(*) AS n,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM supplier GROUP BY s_nationkey
    """,
)
def src_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines write + schema-explicit read-back — the interchange
    format of every crawl/annotation pipeline. The read supplies an
    explicit schema (long/double), because JSON carries no types: the
    agg hash-matching the parquet-sourced oracle proves no value or
    type was lost in the text hop. Scale note: JSONL scans are
    splittable by line so they parallelize like parquet, but carry no
    column pruning or stats — the query projects before writing so
    the JSON only ever holds the needed columns."""
    from pyspark.sql.types import DoubleType, IntegerType as IntT, LongType

    os.makedirs(SCRATCH, exist_ok=True)
    path = os.path.join(SCRATCH, "supplier_jsonl")
    s = load_table(spark, sf_dir, "supplier")
    s.select("s_suppkey", "s_nationkey", "s_acctbal").write.mode(
        "overwrite"
    ).json(path)
    schema = StructType(
        [
            StructField("s_suppkey", LongType()),
            StructField("s_nationkey", IntT()),
            StructField("s_acctbal", DoubleType()),
        ]
    )
    s2 = spark.read.json(path, schema=schema)
    return s2.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("s_acctbal").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_bal"),
    )


@query(
    "src_python_datasource",
    oracle="""
    WITH gen AS (
      SELECT p.part_id, s.seq,
             (p.part_id * 1000003 + s.seq * 97) % 1000000007 AS value
      FROM unnest(range(8)) AS p(part_id),
           unnest(range(1000)) AS s(seq)
    )
    SELECT part_id, COUNT(*) AS n,
           CAST(SUM(value) AS BIGINT) AS value_sum,
           CAST(MIN(value) AS BIGINT) AS value_min,
           CAST(MAX(value) AS BIGINT) AS value_max
    FROM gen GROUP BY part_id
    """,
)
def src_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource (Spark 4 connector API,
    `sources/pysource.py`): the driver plans 8 input partitions,
    every executor task generates only its partition's rows, and the
    aggregation proves the parallel scan delivered exactly the
    declared row set — the engine-native template for wrapping any
    external system (API pages, proprietary formats, queue snapshots)
    as a first-class parallel scan instead of a driver-side collect.
    The generator is a fixed congruential sequence, so the whole scan
    is SQL-replicable."""
    from fuzzy_item_matching_spark.sources.pysource import (
        SyntheticSeqDataSource,
    )

    try:
        spark.dataSource.register(SyntheticSeqDataSource)
    except Exception:  # noqa: BLE001 — already registered in this session
        pass
    df = (
        spark.read.format("synthetic_seq")
        .option("n_parts", 8)
        .option("rows_per_part", 1000)
        .load()
    )
    return df.groupBy("part_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("value").alias("value_sum"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
    )


@query(
    "src_schema_evolution",
    oracle="""
    WITH unioned AS (
      SELECT n_nationkey, n_name, NULL::BIGINT AS pop
      FROM nation WHERE n_regionkey < 2
      UNION ALL
      SELECT n_nationkey, n_name, n_nationkey * 1000 AS pop
      FROM nation WHERE n_regionkey >= 2
    )
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(coalesce(pop, 0)) AS BIGINT) AS pop_sum,
           CAST(SUM(CASE WHEN pop IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_old_schema
    FROM unioned
    """,
)
def src_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across parquet file generations: generation 1
    lacks the ``pop`` column, generation 2 adds it; the mergeSchema
    read reconciles both into one frame where old-generation rows
    surface NULL — the append-only lake reality (a 100 TB table is
    never rewritten when a column lands). The agg distinguishes
    old-generation rows explicitly, proving NULL-backfill semantics
    rather than assuming them.

    Scale note: mergeSchema=true costs a footer read per FILE at plan
    time — fine per-partition-directory; at full-lake scale you pin
    the merged schema in a catalog instead and keep the scan
    footer-cheap."""
    os.makedirs(SCRATCH, exist_ok=True)
    base = os.path.join(SCRATCH, "nation_evolving")
    n = load_table(spark, sf_dir, "nation")
    gen1 = n.filter(F.col("n_regionkey") < 2).select("n_nationkey", "n_name")
    gen2 = n.filter(F.col("n_regionkey") >= 2).select(
        "n_nationkey",
        "n_name",
        (F.col("n_nationkey").cast("long") * 1000).alias("pop"),
    )
    gen1.write.mode("overwrite").parquet(os.path.join(base, "gen=1"))
    gen2.write.mode("overwrite").parquet(os.path.join(base, "gen=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(base, "gen=1"), os.path.join(base, "gen=2")
    )
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.sum(F.coalesce(F.col("pop"), F.lit(0))), F.lit(0))
        .cast("long")
        .alias("pop_sum"),
        F.coalesce(
            F.sum(F.when(F.col("pop").isNull(), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_old_schema"),
    )


@query(
    "src_dynamic_partition_overwrite",
    oracle="""
    WITH final AS (
      SELECT o_orderstatus, o_orderkey,
             CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2
                  ELSE o_totalprice END AS price
      FROM orders
    )
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM final GROUP BY o_orderstatus
    """,
)
def src_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite: the full orders table lands
    partitioned by status, then a corrected 'F' slice (prices doubled)
    overwrites ONLY its own partition — untouched partitions must
    survive byte-for-byte, which the per-status totals prove. This is
    the idempotent backfill primitive of every partitioned lake
    (re-run one day/source without clobbering the rest); the static
    overwrite default would have dropped the other partitions.

    Scale note: partitionOverwriteMode=dynamic scopes the commit to
    partitions present in the WRITE — the job's output set, not the
    table's — so a one-partition backfill of a 100 TB table moves one
    partition of data."""
    os.makedirs(SCRATCH, exist_ok=True)
    path = os.path.join(SCRATCH, "orders_by_status")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderkey", F.col("o_totalprice").alias("price")
    )
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    fixed = o.filter(F.col("o_orderstatus") == "F").withColumn(
        "price", F.col("price") * 2
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        fixed.write.mode("overwrite").partitionBy("o_orderstatus").parquet(
            path
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return (
        spark.read.parquet(path)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("price").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
    )


@query(
    "src_compaction",
    oracle="""
    SELECT 64 AS n_files_before, 4 AS n_files_after,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    """,
)
def src_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction: lineitem deliberately fragmented into 64
    shards (the streaming-ingest pathology — minutes-sized files), then
    compacted to 4 with a coalesce write. Row count and the DECIMAL
    quantity sum prove the rewrite lost nothing; the file counts are
    part of the checked result. coalesce (not repartition) keeps the
    compaction SHUFFLE-FREE — tasks concatenate input splits.

    Scale note: at 100 TB compaction is the single highest-leverage
    maintenance job a lake runs (scan cost ~ file count for planning +
    open overhead); target file size ~ spark.sql.files.
    maxPartitionBytes so one compacted file = one scan split."""
    os.makedirs(SCRATCH, exist_ok=True)
    frag = os.path.join(SCRATCH, "lineitem_fragmented")
    compact = os.path.join(SCRATCH, "lineitem_compacted")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    li.repartition(64).write.mode("overwrite").parquet(frag)
    frag_df = spark.read.parquet(frag)
    n_before = len(
        [f for f in os.listdir(frag) if f.endswith(".parquet")]
    )
    frag_df.coalesce(4).write.mode("overwrite").parquet(compact)
    n_after = len(
        [f for f in os.listdir(compact) if f.endswith(".parquet")]
    )
    return spark.read.parquet(compact).agg(
        F.lit(n_before).alias("n_files_before"),
        F.lit(n_after).alias("n_files_after"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
    )


@query(
    "src_time_travel",
    oracle="""
    WITH v1 AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderstatus = 'O'
    ),
    upd AS (
      SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice
      FROM v1 WHERE o_orderkey % 10 = 0
    ),
    v2 AS (
      SELECT v1.o_orderkey, v1.o_totalprice FROM v1
      WHERE NOT EXISTS (SELECT 1 FROM upd WHERE upd.o_orderkey = v1.o_orderkey)
      UNION ALL
      SELECT o_orderkey, o_totalprice FROM upd
    )
    SELECT
      (SELECT COUNT(*) FROM v1) AS v1_rows,
      (SELECT COUNT(*) FROM v2) AS v2_rows,
      (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
       FROM v1) AS v1_total,
      (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
       FROM v2) AS v2_total
    """,
)
def src_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot versioning + time travel on plain parquet
    (operators/versioned.py — the Delta capability the reference
    leaned on, made engine-portable): snapshot v1 is the open-order
    slice, v2 is v1 with a MERGE upsert applied (10% of keys get a
    price bump); reading v1 AFTER v2 committed must return the
    original rows bit-for-bit, which the per-version DECIMAL totals
    prove. The manifest-last commit protocol is what makes the v1
    read safe against a concurrent v2 writer.

    Scale note: the copy-on-write snapshot here becomes file-level
    reuse at 100 TB (manifest lists files; unchanged files shared) —
    the read/commit protocol the query checks is unchanged."""
    from fuzzy_item_matching_spark.operators.merge import merge_upsert
    from fuzzy_item_matching_spark.operators.versioned import VersionedTable

    path = os.path.join(SCRATCH, "orders_versioned")
    import shutil as _sh

    _sh.rmtree(path, ignore_errors=True)
    vt = VersionedTable(spark, path)
    base = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    ).select("o_orderkey", "o_totalprice")
    v1 = vt.write_version(base)
    # +1000.0 (exact IEEE add on 2-dp prices) rather than *1.1: the
    # float product lands on decimal-cast half-way points where Spark
    # (HALF_UP) and DuckDB round differently (observed 0.1 drift over
    # ~500 rows)
    upd = base.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 1000.0
    )
    v2 = vt.write_version(
        merge_upsert(vt.read(version=v1), upd, keys=["o_orderkey"])
    )
    dec_total = lambda df: df.agg(  # noqa: E731
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("t"),
        F.count(F.lit(1)).alias("n"),
    )
    a = dec_total(vt.read(version=v1)).select(
        F.col("n").alias("v1_rows"), F.col("t").alias("v1_total")
    )
    b = dec_total(vt.read(version=v2)).select(
        F.col("n").alias("v2_rows"), F.col("t").alias("v2_total")
    )
    return a.crossJoin(b).select(
        "v1_rows", "v2_rows", "v1_total", "v2_total"
    )


from fuzzy_item_matching_spark.operators.zorder import (  # noqa: E402
    zorder_key,
    zorder_key_sql,
)

# Epoch at/below the TPC-H data minimum (orders span 1992-1998) so the
# day offset honors zorder_key's non-negative-int contract — a later
# epoch would two's-complement-truncate 1992-1994 dates into the top of
# the 16-bit range and alias silently once |value| >= 2^16.
_Z_EPOCH = "1992-01-01"
_Z_DUCK = zorder_key_sql(
    "o_custkey", f"date_diff('day', DATE '{_Z_EPOCH}', o_orderdate)"
)


@query(
    "src_zorder_layout",
    oracle=f"""
    WITH z AS (
      SELECT o_custkey,
             date_diff('day', DATE '1992-01-01', o_orderdate) AS day,
             {_Z_DUCK} AS zkey
      FROM orders
    )
    SELECT CAST(zkey >> 16 AS BIGINT) AS bucket,
           COUNT(*) AS n,
           MIN(o_custkey) AS min_cust, MAX(o_custkey) AS max_cust,
           MIN(day) AS min_day, MAX(day) AS max_day
    FROM z GROUP BY bucket
    """,
)
def src_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (o_custkey, order-day),
    summarized per 64Ki z-range bucket: each bucket's min/max in BOTH
    dimensions is tight, which is exactly the property that lets
    parquet min/max stats prune a 2-D range predicate after a
    clustered write (operators/zorder.py; the write + file-skipping
    assertion lives in tests/test_zorder.py). The reference has no
    layout management at all — its notebooks re-scan everything; this
    is the extension that makes a 100 TB two-dimensional workload
    scan-bounded.

    Plan: the Morton key is a 32-term integer expression (whole-stage
    codegen, no UDF, no shuffle); the bucket agg is one
    map-side-combinable hash agg on ≤2^8 buckets. Exact oracle: the
    identical generated arithmetic on the DuckDB side.
    """
    o = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit(_Z_EPOCH).cast("date"))
    z = o.select(
        "o_custkey",
        day.alias("day"),
        zorder_key(F.col("o_custkey"), day).alias("zkey"),
    )
    return (
        z.groupBy(F.shiftright("zkey", 16).cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_custkey").alias("min_cust"),
            F.max("o_custkey").alias("max_cust"),
            F.min("day").alias("min_day"),
            F.max("day").alias("max_day"),
        )
    )


@query(
    "src_snapshot_diff",
    oracle="""
    WITH v1 AS (
      SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders WHERE o_orderkey % 13 != 3
    ),
    v2 AS (
      SELECT o_orderkey,
             CAST(o_totalprice AS DECIMAL(18,2))
               + CASE WHEN o_orderkey % 7 = 0
                      THEN CAST(5.00 AS DECIMAL(18,2))
                      ELSE CAST(0.00 AS DECIMAL(18,2)) END AS price
      FROM orders WHERE o_orderkey % 11 != 5
    ),
    d AS (
      SELECT CASE WHEN v1.o_orderkey IS NULL THEN 'added'
                  WHEN v2.o_orderkey IS NULL THEN 'removed'
                  WHEN v1.price != v2.price THEN 'changed'
                  ELSE 'unchanged' END AS status,
             coalesce(v2.price, 0) - coalesce(v1.price, 0) AS delta
      FROM v1 FULL OUTER JOIN v2 USING (o_orderkey)
    )
    SELECT status, COUNT(*) AS n,
           CAST(SUM(delta) AS DOUBLE) AS price_delta
    FROM d GROUP BY status
    """,
)
def src_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot reconciliation (table diff): classify every key across
    two table versions as added / removed / changed / unchanged and
    total the value drift per class — the audit that backs any
    incremental-pipeline correctness claim (and the anti-entropy check
    between a lake table and its upstream). Versions are derived
    in-plan from `orders` so the diff itself is the unit under test.

    Plan: one full-outer sort-merge join on the key, then a
    map-side-combinable 4-group agg — the canonical diff shape. At
    100 TB both snapshots bucket by key → the join goes shuffle-free;
    the delta agg output is 4 rows regardless of scale. Change
    detection on wide rows would md5 a canonical column concat instead
    of comparing one column (same plan).

    Determinism: prices compare and sum as DECIMAL(18,2) (exact),
    cast to double only in the final projection.
    """
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")
    v1 = o.filter(F.col("o_orderkey") % 13 != 3).select(
        "o_orderkey", price.alias("price")
    )
    v2 = o.filter(F.col("o_orderkey") % 11 != 5).select(
        "o_orderkey",
        (
            price
            + F.when(
                F.col("o_orderkey") % 7 == 0, F.lit("5.00")
            )
            .otherwise(F.lit("0.00"))
            .cast("decimal(18,2)")
        ).alias("price"),
    )
    d = v1.alias("v1").join(
        v2.alias("v2"), on="o_orderkey", how="full_outer"
    ).select(
        F.when(F.col("v1.price").isNull(), "added")
        .when(F.col("v2.price").isNull(), "removed")
        .when(F.col("v1.price") != F.col("v2.price"), "changed")
        .otherwise("unchanged")
        .alias("status"),
        (
            F.coalesce(F.col("v2.price"), F.lit(0).cast("decimal(18,2)"))
            - F.coalesce(F.col("v1.price"), F.lit(0).cast("decimal(18,2)"))
        ).alias("delta"),
    )
    return d.groupBy("status").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("delta").cast("double").alias("price_delta"),
    )


@query(
    "src_scd2_history",
    oracle="""
    WITH base AS (
      SELECT c_custkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      FROM customer
    ),
    delta AS (
      SELECT c_custkey,
             bal + CAST('100.00' AS DECIMAL(18,2)) AS new_bal
      FROM base WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT c_custkey + 1000000 AS c_custkey, bal AS new_bal
      FROM base WHERE c_custkey % 13 = 0
    ),
    j AS (
      SELECT COALESCE(b.c_custkey, d.c_custkey) AS c_custkey,
             b.bal, d.new_bal,
             b.c_custkey IS NOT NULL AS in_base,
             d.c_custkey IS NOT NULL AS in_delta
      FROM base b FULL OUTER JOIN delta d ON b.c_custkey = d.c_custkey
    ),
    hist AS (
      -- closed-out prior versions (value actually changed)
      SELECT c_custkey, bal, 0 AS valid_from, 1 AS valid_to
      FROM j WHERE in_base AND in_delta AND bal <> new_bal
      UNION ALL
      -- still-current untouched (or no-op delta) rows
      SELECT c_custkey, bal, 0 AS valid_from, NULL AS valid_to
      FROM j WHERE in_base AND (NOT in_delta OR bal = new_bal)
      UNION ALL
      -- new current versions: changed keys + inserts
      SELECT c_custkey, new_bal AS bal, 1 AS valid_from, NULL AS valid_to
      FROM j WHERE in_delta AND (NOT in_base OR bal <> new_bal)
    )
    SELECT c_custkey, CAST(bal AS DOUBLE) AS bal,
           CAST(valid_from AS INT) AS valid_from,
           CAST(valid_to AS INT) AS valid_to,
           valid_to IS NULL AS is_current
    FROM hist
    """,
)
def src_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension TYPE-2 apply — the lake-maintenance
    classic the MERGE sink (S6) doesn't cover: instead of overwriting
    a matched row, the current version is CLOSED OUT (valid_to set)
    and the new value opens a fresh version row, so every historical
    state stays queryable (the warehouse pattern behind as-of joins
    and time travel). Versions are derived in-plan from `customer`
    (the snapshot-diff convention): +100.00 balance changes for
    custkey % 7, brand-new keys for % 13; a delta row equal to the
    current value is a NO-OP — no spurious version churn.

    Plan: WRITTEN as one full-outer join on the business key with
    three filtered branch projections; Catalyst's EliminateOuterJoin
    pushes each branch's null-side predicates through and
    specializes the join per branch (Inner / LeftOuter / RightOuter
    — pinned in tests/test_plans.py), so each branch pays only the
    join class it needs. All three stay key equi-joins — shuffle-free
    under key bucketing at 100 TB. Balances compare and add as
    DECIMAL(18,2) (exact); double only in the final projection.
    History growth per batch is |changed| + |inserted| rows."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_acctbal").cast("decimal(18,2)").alias("bal")
    )
    delta = c.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        (F.col("bal") + F.lit("100.00").cast("decimal(18,2)")).alias(
            "new_bal"
        ),
    ).unionByName(
        c.filter(F.col("c_custkey") % 13 == 0).select(
            (F.col("c_custkey") + 1000000).alias("c_custkey"),
            F.col("bal").alias("new_bal"),
        )
    )
    j = (
        c.alias("b")
        .join(delta.alias("d"), "c_custkey", "full_outer")
        .select(
            "c_custkey",
            "bal",
            "new_bal",
            F.col("bal").isNotNull().alias("in_base"),
            F.col("new_bal").isNotNull().alias("in_delta"),
        )
    )
    closed = j.filter(
        F.col("in_base") & F.col("in_delta")
        & (F.col("bal") != F.col("new_bal"))
    ).select(
        "c_custkey", "bal",
        F.lit(0).alias("valid_from"), F.lit(1).alias("valid_to"),
    )
    kept = j.filter(
        F.col("in_base")
        & (~F.col("in_delta") | (F.col("bal") == F.col("new_bal")))
    ).select(
        "c_custkey", "bal",
        F.lit(0).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
    )
    fresh = j.filter(
        F.col("in_delta")
        & (~F.col("in_base") | (F.col("bal") != F.col("new_bal")))
    ).select(
        "c_custkey", F.col("new_bal").alias("bal"),
        F.lit(1).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
    )
    hist = closed.unionByName(kept).unionByName(fresh)
    return hist.select(
        "c_custkey",
        F.col("bal").cast("double").alias("bal"),
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


@query(
    "src_quarantine_split",
    oracle="""
    WITH raw AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 19 = 1 THEN -o_totalprice
                  ELSE o_totalprice END AS price,
             CASE WHEN o_orderkey % 23 = 2 THEN 'X'
                  ELSE o_orderstatus END AS status,
             CASE WHEN o_orderkey % 29 = 3 THEN NULL
                  ELSE o_custkey END AS custkey
      FROM orders
    ),
    flagged AS (
      SELECT list_filter([
               CASE WHEN price <= 0 THEN 'nonpositive_price' END,
               CASE WHEN status NOT IN ('O', 'F', 'P') THEN 'bad_status' END,
               CASE WHEN custkey IS NULL THEN 'null_custkey' END
             ], x -> x IS NOT NULL) AS reasons
      FROM raw
    )
    SELECT reason, COUNT(*) AS n FROM (
      SELECT unnest(CASE WHEN len(reasons) = 0 THEN ['valid']
                    ELSE reasons END) AS reason
      FROM flagged
    ) GROUP BY reason
    """,
)
def src_quarantine_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation-based quarantine split: every ingested row is
    checked against a rule set and either passes ('valid') or is
    counted once PER violated rule — the reason-coded quarantine any
    production bronze→silver hop needs (bad rows route to a quarantine
    sink with machine-readable reasons instead of failing the job).
    Corruptions are injected in-plan from `orders` so the validator
    itself is the unit under test.

    Plan: rules are row-local CASE expressions collected into an array
    (no UDF); the multi-reason fan-out is one explode bounded by
    |rules|; the tally is a map-side-combinable agg on ≤|rules|+1
    keys. At 100 TB: embarrassingly parallel scan, KB-sized output —
    and the same `reasons` array routes full rows via
    ``filter(size(reasons)=0)`` / its negation into the two sinks
    without recomputing the rules.
    """
    o = load_table(spark, sf_dir, "orders")
    raw = o.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 19 == 1, -F.col("o_totalprice"))
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
        F.when(F.col("o_orderkey") % 23 == 2, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("status"),
        F.when(F.col("o_orderkey") % 29 == 3, F.lit(None).cast("long"))
        .otherwise(F.col("o_custkey"))
        .alias("custkey"),
    )
    reasons = F.filter(
        F.array(
            F.when(F.col("price") <= 0, F.lit("nonpositive_price")),
            F.when(~F.col("status").isin("O", "F", "P"), F.lit("bad_status")),
            F.when(F.col("custkey").isNull(), F.lit("null_custkey")),
        ),
        lambda x: x.isNotNull(),
    )
    flagged = raw.select(reasons.alias("reasons"))
    exploded = flagged.select(
        F.explode(
            F.when(F.size("reasons") == 0, F.array(F.lit("valid"))).otherwise(
                F.col("reasons")
            )
        ).alias("reason")
    )
    return exploded.groupBy("reason").agg(F.count(F.lit(1)).alias("n"))


@query(
    "src_bucketed_colocated_join",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(18,4))))
             AS DOUBLE) AS revenue
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def src_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The co-located big-big join — Spark's bucketing as the 100 TB
    answer to repeated fact-fact joins: both sides are written
    ``bucketBy(16, orderkey).sortBy`` (operators/skew.write_bucketed),
    so the subsequent equi-join runs as a SortMergeJoin over
    PRE-BUCKETED scans with NO shuffle on either side — the join-side
    exchange is paid ONCE at write time and amortized over every
    later join on the key (the fuzzy-matching pipeline joins
    pairs↔features↔labels on the same id repeatedly; this is that
    layout decision made explicit and driver-checked). The only
    exchange left in the plan is the final small group-by; pinned in
    tests/test_plans.py. Bucketing never changes CONTENT, so the
    oracle is the plain join — what's verified is that the layout
    path computes the identical result."""
    from fuzzy_item_matching_spark.operators.skew import write_bucketed

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    write_bucketed(o, "src_colo_orders", "o_orderkey", 16)
    write_bucketed(li, "src_colo_lineitem", "l_orderkey", 16)
    ob = spark.table("src_colo_orders")
    lb = spark.table("src_colo_lineitem")
    # merge hint: at test scale the orders side fits the broadcast
    # threshold and AQE would pick BHJ, hiding the layout this query
    # exists to demonstrate; at 100 TB NEITHER side broadcasts and
    # SMJ-over-buckets is the only shuffle-free plan — pin that one.
    return (
        ob.hint("merge").join(lb, lb["l_orderkey"] == ob["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,4)"))
            )
            .cast("double")
            .alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Hidden _metadata columns: file-level lineage from the reader itself
# ---------------------------------------------------------------------------


@query(
    "src_file_metadata",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(1 AS BIGINT) AS n_files
    FROM orders GROUP BY o_orderstatus
    """,
)
def src_file_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIDDEN `_metadata` FILE COLUMNS — the Spark reader's built-in
    lineage surface: write orders partitioned by status (one file per
    partition via a key repartition), read back, and derive per-
    partition row counts AND file counts purely from
    `_metadata.file_path` — no directory listing, no external
    catalog. This is how production pipelines attribute bad rows to
    source files, audit small-file explosions, and build incremental
    manifests; here it also PINS the write layout (n_files = 1 per
    partition) so a compaction regression fails loudly.

    Scale shape: `_metadata` is populated by the scan itself (zero
    extra I/O — constant per split); the audit is one
    map-side-combinable aggregation keyed on the partition value
    extracted from the path. At 100 TB this replaces a driver-side
    file listing with a distributed scan the engine was doing anyway.

    Determinism: the oracle states the SEMANTIC layout contract (the
    src_csv_roundtrip convention — the roundtrip is the Spark side's
    job): per-status row counts must survive the write/read cycle and
    each partition must land in exactly one file (guaranteed by the
    pre-write repartition on the partition key).
    """
    import os

    o = load_table(spark, sf_dir, "orders")
    root = os.path.join(SCRATCH, "meta_orders")
    (
        o.repartition("o_orderstatus")
        .write.mode("overwrite")
        .partitionBy("o_orderstatus")
        .parquet(root)
    )
    back = spark.read.parquet(root).select(
        F.col("_metadata.file_path").alias("fp"),
    )
    return (
        back.groupBy(
            F.regexp_extract(
                F.col("fp"), "o_orderstatus=([A-Z])", 1
            ).alias("status")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("fp").alias("n_files"),
        )
    )
