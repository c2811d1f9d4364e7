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


# ---------------------------------------------------------------------------
# First-principles replays for round-13 births (independent of DuckDB)
# ---------------------------------------------------------------------------


def _load_pd(table, sf=None):
    import pyarrow.parquet as pq

    from .conftest import SF_CHECK, SF_SMOKE

    return pq.read_table(
        f"{sf or SF_SMOKE}/{table}.parquet"
    ).to_pandas()


def test_xicor_and_spearman_match_numpy_replay(spark):
    """Both rank statistics re-derived in numpy from the same parquet
    with the same (value, key) tie-breaks."""
    from fuzzy_item_matching_spark.queries import load_all

    from .conftest import SF_CHECK

    reg = load_all()
    part = _load_pd("part", SF_CHECK)
    import decimal

    part = part.sort_values("p_partkey").reset_index(drop=True)
    price = part["p_retailprice"].map(
        lambda v: decimal.Decimal(str(round(v, 2)))
    )
    n = len(part)
    # ranks with (value, key) tie-break
    ry = (
        part.assign(_p=price)
        .sort_values(["_p", "p_partkey"])
        .reset_index()
        .reset_index()
        .set_index("index")["level_0"]
        .sort_index()
        .to_numpy()
        + 1
    )
    rx = (
        part.sort_values(["p_size", "p_partkey"])
        .reset_index()
        .reset_index()
        .set_index("index")["level_0"]
        .sort_index()
        .to_numpy()
        + 1
    )
    order_x = np.lexsort((part["p_partkey"].to_numpy(), part["p_size"].to_numpy()))
    seq = ry[order_x]
    s = np.abs(np.diff(seq.astype(np.int64))).sum()
    xi = round(1.0 - 3.0 * float(s) / (float(n) * n - 1.0), 9)
    d2 = int(((rx.astype(np.int64) - ry.astype(np.int64)) ** 2).sum())
    rho = round(1.0 - 6.0 * float(d2) / (float(n) * (float(n) * n - 1.0)), 9)

    got_xi = reg["train_xicor"].fn(spark, SF_CHECK).collect()[0]
    got_rho = reg["train_spearman_corr"].fn(spark, SF_CHECK).collect()[0]
    assert got_xi["n"] == n and round(got_xi["xi"], 9) == xi
    assert got_rho["n"] == n and round(got_rho["rho"], 9) == rho


def test_fifo_allocation_invariants(spark):
    """Structural FIFO contract on the real output: funded slices
    never exceed prices, per-customer funded total never exceeds the
    budget, and funded+unfunded reconstructs the customer's order
    total exactly."""
    import decimal

    from fuzzy_item_matching_spark.queries import load_all

    from .conftest import SF_CHECK

    reg = load_all()
    out = {
        r.cust: r
        for r in reg["rel_fifo_allocation"].fn(spark, SF_CHECK).collect()
    }
    assert out  # some customers must be underfunded at sf0.01
    cust = _load_pd("customer", SF_CHECK).set_index("c_custkey")
    orders = _load_pd("orders", SF_CHECK)
    D = lambda v: decimal.Decimal(str(round(v, 2)))  # noqa: E731
    for c, r in list(out.items())[:200]:
        bal = max(D(float(cust.loc[c, "c_acctbal"])), decimal.Decimal(0))
        mine = orders[orders["o_custkey"] == c]
        total = sum((D(v) for v in mine["o_totalprice"]), decimal.Decimal(0))
        funded = D(r.funded_total)
        unfunded = D(r.unfunded_total)
        assert funded + unfunded == total
        assert funded <= bal
        assert r.n_orders == len(mine)
        assert 0 <= r.fully_funded <= r.n_orders


def test_theil_decomposition_identity(spark):
    """Theil-T is exactly decomposable: total = within + between (up
    to the documented 12-digit term rounding)."""
    from fuzzy_item_matching_spark.queries import load_all

    from .conftest import SF_CHECK

    reg = load_all()
    r = reg["rel_theil_decomposition"].fn(spark, SF_CHECK).collect()[0]
    assert r.theil_total > 0
    assert abs(r.theil_total - (r.theil_within + r.theil_between)) < 1e-6
    assert r.theil_within > 0 and r.theil_between >= 0


def test_adamic_adar_matches_python_replay(spark):
    """Top-50 AA pairs re-derived in pure python from the same
    parquet: basket cap, adjacency cap, degree weighting, rounding
    and tie-breaks all replayed."""
    import decimal
    import math
    from collections import defaultdict

    from fuzzy_item_matching_spark.queries import load_all
    from fuzzy_item_matching_spark.queries.analytics import (
        _AA_ADJ_CAP,
        _AA_TOPK,
        _BASKET_CAP,
    )

    from .conftest import SF_CHECK

    reg = load_all()
    got = [
        (r.part_a, r.part_b, r.common_neighbors, round(r.adamic_adar, 9))
        for r in reg["rel_adamic_adar"].fn(spark, SF_CHECK).collect()
    ]
    li = _load_pd("lineitem", SF_CHECK)
    baskets = defaultdict(set)
    for o, p in zip(li["l_orderkey"], li["l_partkey"]):
        baskets[o].add(p)
    g = set()
    for ps in baskets.values():
        kept = sorted(ps)[:_BASKET_CAP]
        for x in kept:
            for y in kept:
                if x != y:
                    g.add((x, y))
    adj = defaultdict(list)
    for s, d in sorted(g):
        adj[s].append(d)
    deg = {v: len(ds) for v, ds in adj.items()}
    capped = {v: ds[:_AA_ADJ_CAP] for v, ds in adj.items()}
    pairs = defaultdict(lambda: [decimal.Decimal(0), 0])
    for u in capped:
        for v in capped[u]:
            for w in capped.get(v, ()):
                if u < w and (u, w) not in g:
                    acc = pairs[(u, w)]
                    acc[0] += decimal.Decimal(
                        str(round(1.0 / math.log(deg[v]), 12))
                    )
                    acc[1] += 1
    ranked = sorted(
        ((aa, cn, u, w) for (u, w), (aa, cn) in pairs.items()),
        key=lambda t: (-t[0], t[2], t[3]),
    )[:_AA_TOPK]
    want = [(u, w, cn, round(float(aa), 9)) for aa, cn, u, w in ranked]
    assert got == want


def test_rake_matches_python_replay(spark):
    """RAKE phrases + scores re-derived in pure python from the same
    corpus (stopword segmentation, degree/freq word stats, per-phrase
    rounded-term sums, final ranking)."""
    import decimal
    import re as _re
    from collections import Counter, defaultdict

    from fuzzy_item_matching_spark.functions.text import ENGLISH_STOPWORDS
    from fuzzy_item_matching_spark.queries import load_all
    from fuzzy_item_matching_spark.queries.textstats import (
        _RAKE_MAXLEN,
        _RAKE_TOPK,
    )

    reg = load_all()
    got = [
        (r.phrase, r.n_occurrences, round(r.score, 9), r.rnk)
        for r in reg["ts_rake_keyphrases"].fn(spark, SF_SMOKE).collect()
    ]
    docs = _load_pd("documents")
    stop = set(ENGLISH_STOPWORDS)
    phrases = []  # (phrase, words)
    for text in docs["text"].fillna(""):
        toks = [
            t for t in _re.split(r"[^\w\d]", text.lower()) if len(t) >= 1
        ]
        run = []
        for t in toks + [None]:
            if t is None or t in stop:
                if run and len(run) <= _RAKE_MAXLEN:
                    phrases.append((" ".join(run), list(run)))
                run = []
            else:
                run.append(t)
    freq, degree = Counter(), Counter()
    for _, words in phrases:
        for w in words:
            freq[w] += 1
            degree[w] += len(words) - 1
    # score per DISTINCT phrase = sum of its word-slot scores
    occ = Counter(p for p, _ in phrases)
    scored = {}
    for p, words in {p: w for p, w in phrases}.items():
        acc = decimal.Decimal(0)
        for w in words:
            acc += decimal.Decimal(str(round(degree[w] / freq[w], 9)))
        scored[p] = round(float(acc), 9)
    ranked = sorted(scored.items(), key=lambda kv: (-kv[1], kv[0]))[
        :_RAKE_TOPK
    ]
    want = [
        (p, occ[p], s, i + 1) for i, (p, s) in enumerate(ranked)
    ]
    assert got == want


def test_boilerplate_census_matches_python_replay(spark):
    """5-gram cross-document census replayed in pure python."""
    import re as _re
    from collections import Counter

    from fuzzy_item_matching_spark.queries import load_all
    from fuzzy_item_matching_spark.queries.textstats import (
        _BP_MIN_DOCS,
        _BP_N,
        _BP_TOPK,
    )

    reg = load_all()
    got = [
        (r.ngram, r.doc_freq, r.rnk)
        for r in reg["ts_boilerplate_ngrams"].fn(spark, SF_SMOKE).collect()
    ]
    docs = _load_pd("documents")
    df = Counter()
    for text in docs["text"].fillna(""):
        toks = [
            t for t in _re.split(r"[^\w\d]", text.lower()) if len(t) >= 1
        ]
        grams = {
            " ".join(toks[i : i + _BP_N])
            for i in range(len(toks) - _BP_N + 1)
        }
        df.update(grams)
    census = [(g, c) for g, c in df.items() if c >= _BP_MIN_DOCS]
    ranked = sorted(census, key=lambda t: (-t[1], t[0]))[:_BP_TOPK]
    want = [(g, c, i + 1) for i, (g, c) in enumerate(ranked)]
    assert got == want


def test_coverage_greedy_matches_python_replay(spark):
    """Greedy bigram max-coverage picks replayed in pure python
    (gain, tie-break, covered-set evolution)."""
    import re as _re

    from fuzzy_item_matching_spark.queries import load_all
    from fuzzy_item_matching_spark.queries.textstats import _COV_ROUNDS

    reg = load_all()
    got = [
        (r["round"], r.doc_id, r.gain, r.covered_terms)
        for r in sorted(
            reg["ts_coverage_greedy"].fn(spark, SF_SMOKE).collect(),
            key=lambda r: r["round"],
        )
    ]
    docs = _load_pd("documents")
    post = {}
    for did, text in zip(docs["doc_id"], docs["text"].fillna("")):
        toks = [
            t for t in _re.split(r"[^\w\d]", text.lower()) if len(t) >= 1
        ]
        post[did] = {
            f"{toks[i]} {toks[i + 1]}" for i in range(len(toks) - 1)
        }
    covered = set()
    want = []
    for rnd in range(1, _COV_ROUNDS + 1):
        best = None
        for did in sorted(post):
            gain = len(post[did] - covered)
            if best is None or gain > best[1]:
                best = (did, gain)
        covered |= post[best[0]]
        want.append((rnd, best[0], best[1], len(covered)))
    assert got == want
