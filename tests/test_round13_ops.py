"""Round-13 operator contracts.

First-principles pins for this round's operator work: the
query-directed multi-probe refactor (recall must not regress vs the
exhaustive-1-flip config it replaced, at half the index) and the
serve-path cap-binding parity demanded by the r12 verdict (the caps
must stay oracle-exact when they BIND, not only when they idle).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .conftest import SF_CHECK, SF_SMOKE


def _brute_topk(e, k=3):
    from fuzzy_item_matching_spark.functions.vector import cosine_similarity

    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(b, F.col("a.vec_id") != F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("qid"),
        F.col("b.vec_id").alias("nid"),
        cosine_similarity(F.col("a.embedding"), F.col("b.embedding")).alias(
            "cosine"
        ),
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return {
        (r.qid, r.nid)
        for r in pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .collect()
    }


def test_directed_multiprobe_recall_not_below_exhaustive(spark):
    """r12 VERDICT ask #3 pin: the query-directed configuration that
    now backs sim_ann_multiprobe_lsh (2 tables, 13 margin-ranked
    perturbation sets of <=3 bits) must deliver recall >= the 4-table
    exhaustive-1-flip configuration it replaced — with HALF the index
    and blockwise (not per-pair) verification. Measured at commit
    time: 0.713 vs 0.679 on the sf0.01 embeddings."""
    from fuzzy_item_matching_spark.operators.lsh import lsh_multiprobe_topk
    from fuzzy_item_matching_spark.tables import load_table

    e = load_table(spark, SF_CHECK, "embeddings").persist()
    truth = _brute_topk(e)
    old = {
        (r.qid, r.nid)
        for r in lsh_multiprobe_topk(
            e, "vec_id", "embedding", k=3, n_tables=4, bits_per_table=6,
            seed=42, dim=64,
        ).collect()
    }
    new = {
        (r.qid, r.nid)
        for r in lsh_multiprobe_topk(
            e, "vec_id", "embedding", k=3, n_tables=2, bits_per_table=6,
            seed=42, dim=64, probe_budget=13, max_flip=3,
        ).collect()
    }
    rec_old = len(old & truth) / len(truth)
    rec_new = len(new & truth) / len(truth)
    assert rec_new >= rec_old
    assert rec_new > 0.7  # the measured 0.713, with slack
    e.unpersist()


def test_directed_multiprobe_blockwise_equals_join_scoring(spark):
    """The blockwise cogrouped verification must produce the exact
    same (qid, nid, cosine, rnk) rows as scoring the same directed
    candidate set through the fold-expression path — i.e. the numpy
    block kernel is bitwise-faithful to the engine expression. Pinned
    at sf0.001 where the per-pair path is cheap."""
    from fuzzy_item_matching_spark.functions.vector import cosine_similarity
    from fuzzy_item_matching_spark.operators.lsh import (
        lsh_multiprobe_topk,
        sign_bucket_frame,
    )
    from fuzzy_item_matching_spark.tables import load_table

    e = load_table(spark, SF_SMOKE, "embeddings").persist()
    cfg = dict(n_tables=2, bits_per_table=6, seed=42, dim=64)
    got = {
        (r.qid, r.nid, round(r.cosine, 12), r.rnk)
        for r in lsh_multiprobe_topk(
            e, "vec_id", "embedding", k=3, probe_budget=13, max_flip=3, **cfg
        ).collect()
    }
    # reference path: candidates from the same probe frame, scored by
    # the fold expression, ranked globally
    framed = sign_bucket_frame(
        e, "vec_id", "embedding", cfg["n_tables"], cfg["bits_per_table"],
        cfg["seed"], cfg["dim"], probe_budget=13, max_flip=3,
    )
    probes = framed.select(
        F.col("__id").alias("qid"),
        "__tbl",
        F.explode(
            F.concat(F.array(F.col("__bkt")), F.col("__probes"))
        ).alias("__probe"),
    )
    idx = framed.select("__tbl", "__bkt", F.col("__id").alias("nid"))
    cand = (
        probes.join(
            idx,
            (probes["__tbl"] == idx["__tbl"])
            & (probes["__probe"] == idx["__bkt"]),
        )
        .filter(F.col("qid") != F.col("nid"))
        .select("qid", "nid")
        .distinct()
    )
    q = e.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
    n = e.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("nv"))
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    want = {
        (r.qid, r.nid, round(r.cosine, 12), r.rnk)
        for r in cand.join(q, "qid")
        .join(n, "nid")
        .select(
            "qid",
            "nid",
            cosine_similarity(F.col("qv"), F.col("nv")).alias("cosine"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .collect()
    }
    assert got == want
    e.unpersist()


def test_directed_probes_are_margin_ranked_and_distinct(spark):
    """Structural probe contract: every probe differs from the own
    bucket, probes are pairwise distinct, and the flip sets are the
    lexicographic-stable smallest total margins — re-derived
    independently in numpy from the same seeded hyperplanes."""
    import itertools

    from fuzzy_item_matching_spark.operators.lsh import (
        random_hyperplanes,
        sign_bucket_frame,
    )
    from fuzzy_item_matching_spark.tables import load_table

    TBL, BITS, T = 2, 6, 13
    e = load_table(spark, SF_SMOKE, "embeddings")
    rows = sign_bucket_frame(
        e, "vec_id", "embedding", TBL, BITS, 42, 64,
        probe_budget=T, max_flip=3,
    ).collect()
    planes = np.asarray(random_hyperplanes(64, TBL * BITS, 42))
    vecs = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in e.collect()
    }
    subsets = sorted(
        s for r in (1, 2, 3) for s in itertools.combinations(range(BITS), r)
    )
    assert rows
    for r in rows:
        assert len(r["__probes"]) == T == len(set(r["__probes"]))
        assert r["__bkt"] not in r["__probes"]
        # independent margin ranking
        acc = np.zeros(TBL * BITS)
        v = vecs[r["__id"]]
        for i in range(64):
            acc += v[i] * planes[:, i]
        m = np.abs(acc[r["__tbl"] * BITS : (r["__tbl"] + 1) * BITS])
        scored = sorted(
            (float(sum(m[list(s)])), s) for s in subsets
        )[:T]
        for probe, (_, s) in zip(r["__probes"], scored):
            want = list(r["__bkt"])
            for j in s:
                want[j] = "1" if want[j] == "0" else "0"
            assert probe == "".join(want)


def test_serve_caps_bind_and_stay_oracle_exact(spark):
    """r12 VERDICT ask #7: the two serve-path caps (per-bucket index
    truncation, per-arrival candidate cap) deliberately do NOT bind
    at sf0.01, so no driver row exercises the binding branch. Here a
    synthetic DENSE corpus makes BOTH bind — every bucket holds more
    stored rows than bucket_cap, every arrival has more
    under-threshold candidates than the candidate cap — and the
    DuckDB replay (same two windows) must still match row-for-row.
    """
    import duckdb
    import pandas as pd

    from fuzzy_item_matching_spark.operators.lsh import (
        lsh_sqdist_join,
        random_hyperplanes,
    )

    DIM, TABLES, BL, SEED = 8, 3, 1.0, 7
    BUCKET_CAP, CAND_CAP, THRESH = 8, 5, 4.0
    rng = np.random.RandomState(11)
    # one tight cluster: everything collides, everything is near
    stored = rng.standard_normal((120, DIM)) * 0.05
    arrivals = rng.standard_normal((15, DIM)) * 0.05
    sdf = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(stored)],
        "id long, v array<double>",
    )
    ndf = spark.createDataFrame(
        [(1000 + i, [float(x) for x in v]) for i, v in enumerate(arrivals)],
        "id long, v array<double>",
    )
    pairs = lsh_sqdist_join(
        ndf, sdf, "id", "v", threshold=THRESH, n_tables=TABLES,
        bucket_length=BL, seed=SEED, dim=DIM, bucket_cap=BUCKET_CAP,
    )
    w = W.partitionBy("id_a").orderBy("sqdist", "id_b")
    got = {
        (r.id_a, r.id_b, round(r.sqdist, 9))
        for r in pairs.withColumn("crn", F.row_number().over(w))
        .filter(F.col("crn") <= CAND_CAP)
        .collect()
    }

    planes = random_hyperplanes(DIM, TABLES, SEED)

    def dot_sql(vec, plane):
        lits = "[" + ",".join(repr(x) for x in plane) + "]"
        return (
            f"list_sum(list_transform(list_zip({vec}, {lits}),"
            " s -> s[1]*s[2]))"
        )

    def bkt(src):
        return "\nUNION ALL\n".join(
            f"SELECT id, {t} AS tbl,"
            f" CAST(floor(({dot_sql('v', p)}) / {BL!r}) AS BIGINT) AS bucket"
            f" FROM {src}"
            for t, p in enumerate(planes)
        )

    con = duckdb.connect()
    con.register(
        "stored_pd",
        pd.DataFrame({"id": range(len(stored)), "v": list(stored)}),
    )
    con.register(
        "new_pd",
        pd.DataFrame(
            {"id": [1000 + i for i in range(len(arrivals))],
             "v": list(arrivals)}
        ),
    )
    con.sql("CREATE VIEW stored AS SELECT id, v::DOUBLE[] AS v FROM stored_pd")
    con.sql("CREATE VIEW newt AS SELECT id, v::DOUBLE[] AS v FROM new_pd")
    sq = (
        "list_sum(list_transform(list_zip(a.v, b.v),"
        " s -> (s[1]-s[2])*(s[1]-s[2])))"
    )
    rows = con.sql(f"""
      WITH sb_all AS ({bkt('stored')}),
      nb AS ({bkt('newt')}),
      sb AS (
        SELECT id, tbl, bucket FROM (
          SELECT id, tbl, bucket,
                 row_number() OVER (PARTITION BY tbl, bucket
                                    ORDER BY id) AS brn
          FROM sb_all
        ) WHERE brn <= {BUCKET_CAP}
      ),
      cand AS (
        SELECT DISTINCT n.id AS id_a, s.id AS id_b
        FROM nb n JOIN sb s ON n.tbl = s.tbl AND n.bucket = s.bucket
      ),
      scored AS (
        SELECT c.id_a, c.id_b, {sq} AS sqdist
        FROM cand c JOIN newt a ON a.id = c.id_a
                    JOIN stored b ON b.id = c.id_b
        WHERE {sq} <= {THRESH}
      )
      SELECT id_a, id_b, round(sqdist, 9) AS sqdist FROM (
        SELECT id_a, id_b, sqdist,
               row_number() OVER (PARTITION BY id_a
                                  ORDER BY sqdist, id_b) AS crn
        FROM scored
      ) WHERE crn <= {CAND_CAP}
    """).fetchall()
    want = {(a, b, s) for a, b, s in rows}

    # preconditions: both caps actually BIND on this corpus
    over = con.sql(f"""
      SELECT MAX(n) FROM (
        SELECT tbl, bucket, COUNT(*) AS n FROM ({bkt('stored')})
        GROUP BY tbl, bucket)
    """).fetchone()[0]
    assert over > BUCKET_CAP  # index truncation binding
    uncapped = con.sql(f"""
      WITH sb_all AS ({bkt('stored')}), nb AS ({bkt('newt')}),
      cand AS (SELECT DISTINCT n.id AS id_a, s.id AS id_b
               FROM nb n JOIN sb_all s
                 ON n.tbl = s.tbl AND n.bucket = s.bucket),
      scored AS (SELECT c.id_a, {sq} AS sqdist
                 FROM cand c JOIN newt a ON a.id = c.id_a
                             JOIN stored b ON b.id = c.id_b
                 WHERE {sq} <= {THRESH})
      SELECT MAX(n) FROM (
        SELECT id_a, COUNT(*) AS n FROM scored GROUP BY id_a)
    """).fetchone()[0]
    assert uncapped > CAND_CAP  # candidate cap binding

    assert got == want
