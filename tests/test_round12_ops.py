"""Property tests for the round-12 changes — the duplicate-collapse
generalization (r11 VERDICT ask #7: ngram_jaccard_pairs and
simhash_pairs get the cosine join's vector-collapse strategy behind
the same adaptive gate), the co-purchase basket cap (ask #4), the
ALS scratch-parquet model table (ask #3), and the widened winnowing
tie-break shift (ADVICE)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def _pairs_set(df, val_col, nd=6):
    return {
        (r["id_a"], r["id_b"], round(float(r[val_col]), nd))
        for r in df.collect()
    }


def _dup_heavy(spark):
    """200 docs, 4 distinct texts — the collapse gate MUST fire."""
    texts = [
        "alpha beta gamma delta epsilon zeta",
        "alpha beta gamma delta epsilon eta",
        "one two three four five six seven",
        "totally different words here now ok",
    ]
    rows = [(i, texts[i % 4]) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, txt string").select(
        "doc_id", F.split("txt", " ").alias("toks")
    )


def _diverse(spark):
    """60 docs, all distinct shingle sets — the gate must NOT fire."""
    rows = [
        (i, f"w{i} w{i + 1} w{i + 2} w{i + 3} shared common tail words")
        for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, txt string").select(
        "doc_id", F.split("txt", " ").alias("toks")
    )


def test_jaccard_collapse_equals_plain_on_duplicates(spark):
    """Collapsed output == plain postings join output (same pairs,
    same jaccard values) on a duplicate-heavy corpus where the gate
    fires — including the intra-group Jaccard-1.0 pairs."""
    from fuzzy_item_matching_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = _dup_heavy(spark)
    collapsed = ngram_jaccard_pairs(
        docs, "doc_id", "toks", n=3, min_jaccard=0.3, collapse_ratio=0.5
    )
    plain = ngram_jaccard_pairs(
        docs, "doc_id", "toks", n=3, min_jaccard=0.3, collapse_ratio=0.0
    )
    got, want = _pairs_set(collapsed, "jaccard"), _pairs_set(plain, "jaccard")
    assert got == want
    # the duplicate classes are real: 200 docs / 4 texts → intra-group
    # pairs alone are 2*C(50,2) + 2*C(50,2); assert scale not vacuity
    assert len(got) > 4000
    assert any(v == 1.0 for _, _, v in got)


def test_jaccard_gate_keeps_plain_path_on_diverse_corpus(spark):
    """On an all-distinct corpus the gate must choose the plain join
    (n_groups == n_docs > ratio·n_docs) and the output still matches
    a forced-collapse run — equality on BOTH corpus shapes."""
    from fuzzy_item_matching_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs = _diverse(spark)
    auto = ngram_jaccard_pairs(docs, "doc_id", "toks", n=2, min_jaccard=0.2)
    forced = ngram_jaccard_pairs(
        docs, "doc_id", "toks", n=2, min_jaccard=0.2, collapse_ratio=1.0
    )
    assert _pairs_set(auto, "jaccard") == _pairs_set(forced, "jaccard")


def test_simhash_intra_class_pairs_all_present(spark):
    """On the duplicate-heavy corpus (gate fires) every intra-class
    pair must surface at hamming 0 — the collapse's self-group
    expansion, both hash families."""
    import itertools

    from fuzzy_item_matching_spark.operators import dedup as D

    docs = _dup_heavy(spark)
    for portable in (False, True):
        got = _pairs_set(
            D.simhash_pairs(docs, "doc_id", "toks", portable=portable),
            "hamming",
        )
        ids = {(a, b): h for a, b, h in got}
        for k in range(4):  # class k = doc ids ≡ k mod 4, sampled to 40
            members = [i for i in range(40) if i % 4 == k]
            for a, b in itertools.combinations(members, 2):
                assert ids.get((a, b)) == 0, (portable, a, b)


def _simhash_brute(spark, docs, max_hamming=3):
    """First-principles reference: fingerprints via the row-local
    simhash_bits fold, banding + hamming in plain Python."""
    from fuzzy_item_matching_spark.operators.dedup import simhash_bits

    fps = {
        r["doc_id"]: int(r["bits"], 2)
        for r in docs.select(
            "doc_id", simhash_bits(F.col("toks")).alias("bits")
        ).collect()
    }
    want = set()
    for a in sorted(fps):
        for b in sorted(fps):
            if a >= b:
                continue
            ham = bin(fps[a] ^ fps[b]).count("1")
            shares = any(
                (fps[a] >> (16 * i)) & 0xFFFF == (fps[b] >> (16 * i)) & 0xFFFF
                for i in range(4)
            )
            if shares and ham <= max_hamming:
                want.add((a, b, float(ham)))
    return want


def test_simhash_matches_bruteforce_both_gate_paths(spark):
    """Exact set equality vs a brute-force reference on BOTH corpus
    shapes: duplicate-heavy (gate on → collapsed banding) and
    all-distinct (gate off → plain banding)."""
    from fuzzy_item_matching_spark.operators.dedup import simhash_pairs

    dup_rows = [(i, ["tok%d" % (i % 3), "x", "y"]) for i in range(30)]
    distinct_rows = [
        (100 + i, ["only%d" % i, "u%d" % i, "shared"]) for i in range(12)
    ]
    for rows, min_pairs in ((dup_rows, 100), (distinct_rows, 0)):
        docs = spark.createDataFrame(
            rows, "doc_id long, toks array<string>"
        )
        got = _pairs_set(simhash_pairs(docs, "doc_id", "toks"), "hamming")
        want = _simhash_brute(spark, docs)
        assert got == want
        assert len(want) >= min_pairs


def test_basket_cap_binds_on_fat_order(spark):
    """A synthetic 100-part order must emit at most CAP·(CAP−1)
    edges, and they must be exactly the pairs over the CAP lowest
    part ids (the deterministic keep rule)."""
    from fuzzy_item_matching_spark.queries.analytics import (
        _BASKET_CAP,
        _cap_baskets,
    )

    lines = spark.createDataFrame(
        [(1, p) for p in range(1000, 1100)] + [(2, 1), (2, 2)],
        "okey long, pid long",
    )
    capped = _cap_baskets(lines)
    got = {(r.okey, r.pid) for r in capped.collect()}
    assert {(2, 1), (2, 2)} <= got
    fat = sorted(p for o, p in got if o == 1)
    assert len(fat) == _BASKET_CAP
    assert fat == list(range(1000, 1000 + _BASKET_CAP))


def test_als_trace_is_a_parquet_model_table(spark):
    """The ALS fit writes its factor trace to scratch parquet ONCE
    and both consumers scan it — no factor rows through the driver
    (r11 ask #3). Second call must not rewrite."""
    import os

    from fuzzy_item_matching_spark.queries import training as T

    t1 = T._als_trace(spark, SF_SMOKE)
    # the path was registered and exists on disk as parquet
    paths = [p for p in T._ALS_TRACE_WRITTEN if "als_trace_" in p]
    assert paths
    path = paths[0]
    assert os.path.isdir(path)
    before = os.stat(path).st_mtime_ns
    t2 = T._als_trace(spark, SF_SMOKE)
    assert os.stat(path).st_mtime_ns == before  # no refit/rewrite
    assert t1.schema == t2.schema
    assert t1.count() == t2.count() > 0


def test_winnowing_shift_survives_long_docs():
    """The widened 2^30 tie-break shift (ADVICE r11): on a document
    longer than the OLD 2^20 position limit, the encoded-key
    selection must still extract TRUE hashes (== lexicographic
    (hash, pos) ground truth), while the old 2^20 encoding provably
    corrupts (extracts values outside the true hash set). Pure-Python
    mirror of the operator's arithmetic — the giant doc never touches
    Spark (the operator itself documents a chunk-upstream contract;
    Spark-vs-mirror equality is pinned on normal-size docs in
    test_round11_ops.py)."""
    import hashlib

    k, w = 7, 4
    text = ("abcdefg hij klmnop " * 60000)[: (1 << 20) + 200]
    n = len(text)
    hashes = [
        int(
            hashlib.md5(text[p - 1 : p - 1 + k].encode()).hexdigest()[:8], 16
        )
        for p in range(1, n - k + 2)
    ]

    def select(shift: int) -> set:
        out = set()
        win: list[int] = []
        for p, h in enumerate(hashes, start=1):
            win.append(h * shift + p)
            if len(win) > w:
                win.pop(0)
            if p >= w:
                out.add(min(win) // shift)
        return out

    truth = set()
    win2: list[tuple] = []
    for p, h in enumerate(hashes, start=1):
        win2.append((h, p))
        if len(win2) > w:
            win2.pop(0)
        if p >= w:
            truth.add(min(win2)[0])

    assert select(1 << 30) == truth  # new shift: exact
    old = select(1 << 20)
    assert old != truth  # the old shift corrupts past 2^20
    assert old - truth  # ...by emitting values that are NOT hashes


def test_multiprobe_dominates_single_probe_recall(spark):
    """At the SAME (tables, bits) config, multiprobe's candidate set
    is a strict superset of single-probe's (probe 0 IS the own
    bucket), so its top-k recall vs brute force must be >= — the
    whole point of probing flip neighbors."""
    from fuzzy_item_matching_spark.operators.lsh import (
        lsh_cosine_topk,
        lsh_multiprobe_topk,
    )
    from fuzzy_item_matching_spark.tables import load_table

    e = load_table(spark, SF_SMOKE, "embeddings")
    cfg = dict(k=3, n_tables=4, bits_per_table=6, seed=42, dim=64)
    single = {
        (r.qid, r.nid)
        for r in lsh_cosine_topk(e, "vec_id", "embedding", **cfg).collect()
    }
    multi = {
        (r.qid, r.nid)
        for r in lsh_multiprobe_topk(
            e, "vec_id", "embedding", **cfg
        ).collect()
    }
    # brute-force truth
    from fuzzy_item_matching_spark.functions.vector import cosine_similarity
    from pyspark.sql.window import Window as W

    a, b = e.alias("a"), e.alias("b")
    pairs = a.join(b, F.col("a.vec_id") != F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("qid"),
        F.col("b.vec_id").alias("nid"),
        cosine_similarity(F.col("a.embedding"), F.col("b.embedding")).alias(
            "cosine"
        ),
    )
    w = W.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    truth = {
        (r.qid, r.nid)
        for r in pairs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .collect()
    }
    rec_s = len(single & truth) / len(truth)
    rec_m = len(multi & truth) / len(truth)
    assert rec_m >= rec_s
    assert rec_m > 0.5  # 4x6 multiprobe must be a usable index here


def test_kcore_peel_is_monotone_and_bounded(spark):
    """Round-12 k-core contract: every survivor's core degree >= k,
    survivors are a subset of the full-degree >= k set (peeling only
    deletes), and re-running one more peel round on the output
    changes nothing IF the output is already stable OR shrinks it
    further (monotonicity either way)."""
    from fuzzy_item_matching_spark.queries.analytics import (
        _KCORE_K,
        _copurchase_graph,
        rel_kcore_parts,
    )

    out = rel_kcore_parts(spark, SF_SMOKE)
    rows = out.collect()
    assert all(r.core_degree >= _KCORE_K for r in rows)
    # subset of the one-shot degree filter (round 1 of the peel)
    _, e = _copurchase_graph(spark, SF_SMOKE, wtype="long")
    deg1 = {
        r.id: r.deg
        for r in e.groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .collect()
    }
    for r in rows:
        assert deg1[r.id] >= _KCORE_K  # first-round degree can only shrink
        assert r.core_degree <= deg1[r.id]


def test_maxscore_equals_unpruned_above_theta(spark):
    """The MaxScore exactness guarantee: pruned top-k == the top-k a
    FULL (unpruned) postings scoring produces over the same panel —
    any doc with score >= theta shares >= 1 essential term."""
    from fuzzy_item_matching_spark.queries.similarity import (
        _MAXSCORE_K,
        _MAXSCORE_QMOD,
        _MAXSCORE_THETA,
        sim_maxscore_topk,
    )
    from fuzzy_item_matching_spark.functions.text import regex_tokenize
    from fuzzy_item_matching_spark.operators.features import tfidf_features
    from fuzzy_item_matching_spark.tables import load_table
    from pyspark.sql.window import Window as W

    got = {
        (r.q, r.d, r.rnk): r.score
        for r in sim_maxscore_topk(spark, SF_SMOKE).collect()
    }
    d = load_table(spark, SF_SMOKE, "documents")
    toks = d.select("doc_id", regex_tokenize("text").alias("toks"))
    feats = tfidf_features(
        toks, ["doc_id"], "toks", binary=True, max_df_ratio=0.9
    )
    wq = feats.filter(F.col("doc_id") % _MAXSCORE_QMOD == 0).select(
        F.col("doc_id").alias("q"), "term", F.col("weight").alias("wq")
    )
    wd = feats.select(
        F.col("doc_id").alias("dd"), "term", F.col("weight").alias("wd")
    )
    full = (
        wq.join(wd, "term")
        .filter(F.col("dd") != F.col("q"))
        .groupBy("q", F.col("dd").alias("d"))
        .agg(F.round(F.sum(F.col("wq") * F.col("wd")), 9).alias("score"))
        .filter(F.col("score") >= _MAXSCORE_THETA)
    )
    w = W.partitionBy("q").orderBy(F.desc("score"), F.asc("d"))
    want = {
        (r.q, r.d, r.rnk): r.score
        for r in full.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _MAXSCORE_K)
        .collect()
    }
    assert got == want and got


def test_quantile_gd_reduces_pinball_loss(spark):
    """The subgradient steps must reduce the empirical pinball loss
    from the zero-weight start to the final iterate (full-batch,
    convex objective, modest lr — descent should be visible)."""
    from fuzzy_item_matching_spark.operators.logreg import quantile_gd_fit

    rows = [(float(y) / 10.0, float(y % 7) / 7.0, float(y % 3) / 3.0)
            for y in range(200)]
    pairs = spark.createDataFrame(rows, "label double, x1 double, x2 double")
    tau, iters = 0.9, 6
    trace = quantile_gd_fit(pairs, ["x1", "x2"], tau=tau, iters=iters)
    w = {
        (r["iter"], r.coef): r.weight for r in trace.collect()
    }

    def pinball(w0, w1, w2):
        tot = 0.0
        for y, x1, x2 in rows:
            r = y - (w0 + w1 * x1 + w2 * x2)
            tot += max(tau * r, (tau - 1.0) * r)
        return tot / len(rows)

    loss0 = pinball(0.0, 0.0, 0.0)
    lossK = pinball(
        w[(iters, "w0")], w[(iters, "w1")], w[(iters, "w2")]
    )
    assert lossK < loss0


def test_mi_terms_nonnegative_and_df_bounded(spark):
    """Mutual information of any 2x2 distribution is >= 0 (Jensen);
    every returned term must respect the df window."""
    from fuzzy_item_matching_spark.queries.textstats import (
        _MI_MIN_DF,
        ts_mi_terms,
    )

    rows = ts_mi_terms(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.mi >= 0.0
        assert r.df >= _MI_MIN_DF


def test_cm_join_size_one_sided(spark):
    """Count-min inner products only ever OVERcount (collisions add
    non-negative mass): est >= true for every sketch row."""
    from fuzzy_item_matching_spark.queries.relational import (
        rel_cm_join_size,
    )

    rows = rel_cm_join_size(spark, SF_SMOKE).collect()
    assert len(rows) == 4
    for r in rows:
        assert r.est_size >= r.true_size
        assert r.overcount == r.est_size - r.true_size


def test_lsh_bucket_cap_bounds_candidates(spark):
    """lsh_sqdist_join(bucket_cap=N) must consider at most N stored
    rows per (table, bucket): with M identical stored vectors in one
    bucket and one query hitting it, pairs <= tables*N (and equal the
    N lowest stored ids per table-dedup)."""
    from fuzzy_item_matching_spark.operators.lsh import lsh_sqdist_join

    vec = [1.0] + [0.0] * 63
    stored = spark.createDataFrame(
        [(i, vec) for i in range(40)], "vec_id long, emb array<double>"
    )
    new = spark.createDataFrame(
        [(1000, vec)], "vec_id long, emb array<double>"
    )
    out = lsh_sqdist_join(
        new, stored, "vec_id", "emb", threshold=1.5,
        n_tables=10, bucket_length=1.0, seed=42, dim=64, bucket_cap=8,
    ).collect()
    ids = sorted({r.id_b for r in out})
    assert ids == list(range(8))  # the 8 lowest ids, nothing beyond
    uncapped = lsh_sqdist_join(
        new, stored, "vec_id", "emb", threshold=1.5,
        n_tables=10, bucket_length=1.0, seed=42, dim=64,
    ).collect()
    assert len({r.id_b for r in uncapped}) == 40


# ---------------------------------------------------------------------------
# round-12 session-2 births: CUSUM changepoints, HITS authorities
# ---------------------------------------------------------------------------


def test_cusum_prefix_min_equals_sequential_recurrence(spark):
    """The relational factorization S_t = P_t - min(0, min P) must
    equal Page's sequential recurrence S_t = max(0, S_{t-1} + x - k)
    replayed row-by-row in Python over the real event stream."""
    from decimal import Decimal

    from fuzzy_item_matching_spark.queries.relational import (
        _CUSUM_H,
        _CUSUM_K,
        rel_cusum_changepoints,
    )
    from fuzzy_item_matching_spark.tables import load_table

    k, h = Decimal(_CUSUM_K), Decimal(_CUSUM_H)
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    ev.sort(key=lambda r: (r["user_id"], r["ts"], r["event_id"]))
    state, expect = {}, {}
    for r in ev:
        u = r["user_id"]
        s = state.get(u, Decimal(0)) + (
            Decimal(str(r["value"])).quantize(Decimal("0.01")) - k
        )
        s = max(Decimal(0), s)
        state[u] = s
        if s > h:
            n, mx, first = expect.get(u, (0, Decimal(0), None))
            expect[u] = (n + 1, max(mx, s), first or r["ts"])
    got = {
        r["user_id"]: (
            r["n_alarms"],
            Decimal(str(r["max_cusum"])).quantize(Decimal("0.01")),
            r["first_alarm_ts"],
        )
        for r in rel_cusum_changepoints(spark, SF_SMOKE).collect()
    }
    assert got == {
        u: (n, mx, first) for u, (n, mx, first) in expect.items()
    }


def test_hits_unnormalized_ranking_matches_normalized(spark):
    """Dropping the per-step normalization must not change the
    authority ORDER: replay the same unrolled steps WITH per-step
    normalization in exact rational arithmetic (normalizing by the
    sum — any positive scalar gives the same order, and Fraction
    keeps the replay exact) and compare the top-k part ranking."""
    from collections import defaultdict
    from fractions import Fraction

    from fuzzy_item_matching_spark.queries.analytics import (
        _HITS_TOPK,
        rel_hits_scores,
    )
    from fuzzy_item_matching_spark.tables import load_table

    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    edges = {
        (r["o_custkey"], r["l_partkey"])
        for r in o.join(li, o.o_orderkey == li.l_orderkey).collect()
    }
    # a1 = A^T . 1  (normalized), h1 = A . a1 (normalized), a2 = A^T . h1
    a1 = defaultdict(lambda: Fraction(0))
    for c, p in edges:
        a1[p] += 1
    norm = sum(a1.values())
    a1 = {p: v / norm for p, v in a1.items()}
    h1 = defaultdict(lambda: Fraction(0))
    for c, p in edges:
        h1[c] += a1[p]
    norm = sum(h1.values())
    h1 = {c: v / norm for c, v in h1.items()}
    a2 = defaultdict(lambda: Fraction(0))
    for c, p in edges:
        a2[p] += h1[c]
    want = sorted(a2, key=lambda p: (-a2[p], p))[:_HITS_TOPK]
    got = [
        r["p_partkey"]
        for r in rel_hits_scores(spark, SF_SMOKE).collect()
    ]
    assert got == want


def test_rf_squared_stump_is_ridge_shrunk_mean_leaf(spark):
    """The squared-loss plug-in must make a 1-round gboost fit a plain
    variance-reduction CART stump: brute-force the same grid in Python
    (g = −y, h = 1 at f = 0) and compare split AND leaves for tree 0."""
    from fuzzy_item_matching_spark.functions.sampling import keyed_uniform
    from fuzzy_item_matching_spark.operators.boosting import GRID
    from fuzzy_item_matching_spark.queries.training import (
        _RF_COMBOS,
        _RF_FRAC,
        _RF_SEED0,
        _lr_pairs,
    )
    from fuzzy_item_matching_spark.operators.boosting import gboost_fit
    import pyspark.sql.functions as SF

    feats = list(_RF_COMBOS[0])
    sub = (
        _lr_pairs(spark, SF_SMOKE)
        .filter(keyed_uniform(SF.col("id_a"), seed=_RF_SEED0) < _RF_FRAC)
        .select("label", *feats)
        .collect()
    )
    [m] = gboost_fit(
        spark.createDataFrame(sub),
        feats,
        rounds=1,
        lam=1.0,
        alpha=0.0,
        gamma=0.0,
        loss="squared",
    ).collect()
    best = None
    for f_ in feats:
        vals = [r[f_] for r in sub]
        mn, mx = min(vals), max(vals)
        for k in range(1, GRID):
            thr = mn + k * (mx - mn) / float(GRID)
            gl = sum(-r["label"] for r in sub if r[f_] <= thr)
            hl = sum(1.0 for r in sub if r[f_] <= thr)
            gr = sum(-r["label"] for r in sub if r[f_] > thr)
            hr = len(sub) - hl
            gain = 0.5 * (
                gl * gl / (hl + 1.0)
                + gr * gr / (hr + 1.0)
                - (gl + gr) ** 2 / (hl + hr + 1.0)
            )
            cand = (round(gain, 6), f_, thr, gl, hl, gr, hr)
            if best is None or cand[0] > best[0]:
                best = cand
    _, f_, thr, gl, hl, gr, hr = best
    assert m["feature"] == f_
    assert abs(m["thr"] - thr) < 1e-9
    # ridge-shrunk region means: w = -G/(H + lambda) = sum(y)/(n + 1)
    assert abs(m["w_le"] - (-gl) / (hl + 1.0)) < 1e-8
    assert abs(m["w_gt"] - (-gr) / (hr + 1.0)) < 1e-8


def test_rf_oob_coverage_matches_bagging_math(spark):
    """~frac^B of rows are in-bag for every tree; the OOB row count
    must equal the pair count minus exactly those."""
    from fuzzy_item_matching_spark.queries.training import (
        _RF_FRAC,
        _RF_TREES,
        _lr_pairs,
        train_rf_oob_eval,
    )

    n_pairs = _lr_pairs(spark, SF_SMOKE).count()
    [row] = train_rf_oob_eval(spark, SF_SMOKE).collect()
    frac = row["n_oob_rows"] / n_pairs
    expect = 1.0 - _RF_FRAC**_RF_TREES
    assert abs(frac - expect) < 0.12  # 899 pairs at sf0.001
    assert 0.0 <= row["mse_oob"] <= 1.0
    assert 0.0 <= row["acc_oob"] <= 1.0


def test_maxsim_matches_numpy_bruteforce(spark):
    """Independent numpy replay of the late-interaction scorer at
    sf0.001: md5 embeddings, cosine, per-q-token max, sum, top-k."""
    import hashlib
    from collections import defaultdict

    import numpy as np

    from fuzzy_item_matching_spark.functions.text import regex_tokenize
    from fuzzy_item_matching_spark.queries.similarity import (
        _MS_DIMS,
        _MS_QUERIES,
        _MS_TOPK,
        sim_maxsim_topk,
    )
    from fuzzy_item_matching_spark.tables import load_table

    def emb(tok):
        h = hashlib.md5(tok.encode()).hexdigest()
        v = np.array(
            [
                (int(h[4 * d : 4 * d + 4], 16) + 0.5) / 65536.0 - 0.5
                for d in range(_MS_DIMS)
            ]
        )
        return v / np.linalg.norm(v)

    toks = (
        load_table(spark, SF_SMOKE, "documents")
        .select(
            "doc_id",
            F.explode(regex_tokenize("text")).alias("tok"),
        )
        .distinct()
        .collect()
    )
    by_doc = defaultdict(list)
    for r in toks:
        by_doc[r["doc_id"]].append(emb(r["tok"]))
    want = {}
    for qid, qtoks in _MS_QUERIES:
        scores = []
        for d, vecs in by_doc.items():
            M = np.stack(vecs)
            s = sum(float(np.max(M @ emb(t))) for t in qtoks)
            scores.append((d, s))
        scores.sort(key=lambda x: (-x[1], x[0]))
        want[qid] = scores[:_MS_TOPK]
    got = defaultdict(list)
    for r in sim_maxsim_topk(spark, SF_SMOKE).orderBy(
        "query_id", "rnk"
    ).collect():
        got[r["query_id"]].append((r["doc_id"], r["score"]))
    assert set(got) == set(want)
    for qid in want:
        assert [d for d, _ in got[qid]] == [d for d, _ in want[qid]]
        for (_, a), (_, b) in zip(got[qid], want[qid]):
            assert abs(a - b) < 1e-9
        # each cos <= 1 so score <= |q|; docs containing an exact
        # query token hit cos = 1 on that term
        assert all(
            s <= len(dict(_MS_QUERIES)[qid]) + 1e-9 for _, s in got[qid]
        )


def test_cuped_matches_numpy_and_preserves_global_mean(spark):
    """Numpy replay of the CUPED estimator (per-user x/y, md5 arms,
    pooled theta, adjusted per-arm stats) + the textbook invariant:
    the user-weighted global mean of Y_adj equals that of Y (the
    adjustment is mean-zero by construction)."""
    import hashlib
    from collections import defaultdict
    from decimal import Decimal

    import numpy as np

    from fuzzy_item_matching_spark.queries.analytics import (
        _CUPED_CUT,
        _CUPED_SEED,
        rel_cuped_adjustment,
    )
    from fuzzy_item_matching_spark.tables import load_table

    rows = load_table(spark, SF_SMOKE, "events").collect()
    cut = _CUPED_CUT
    xs, ys = defaultdict(Decimal), defaultdict(Decimal)
    for r in rows:
        v = Decimal(str(r["value"])).quantize(Decimal("0.01"))
        key = r["user_id"]
        if str(r["ts"]) < cut:
            xs[key] += v
        else:
            ys[key] += v
        ys.setdefault(key, Decimal(0))
        xs.setdefault(key, Decimal(0))
    users = sorted(xs)

    def arm(u):
        h = hashlib.md5(f"{_CUPED_SEED}:{u}".encode()).hexdigest()
        return "treat" if int(h[:8], 16) / 2**32 < 0.5 else "control"

    x = np.array([float(xs[u]) for u in users])
    y = np.array([float(ys[u]) for u in users])
    a = np.array([arm(u) for u in users])
    theta = np.cov(x, y, ddof=1)[0, 1] / np.var(x, ddof=1)
    got = {
        r["arm"]: r for r in rel_cuped_adjustment(spark, SF_SMOKE).collect()
    }
    assert set(got) == {"treat", "control"}
    tot_y = tot_adj = tot_n = 0.0
    for lab in ("treat", "control"):
        m = a == lab
        xa, ya = x[m], y[m]
        yadj = ya - theta * (xa - x.mean())
        r = got[lab]
        assert r["n_users"] == int(m.sum())
        assert abs(r["mean_y"] - ya.mean()) < 1e-6
        assert abs(r["mean_y_adj"] - yadj.mean()) < 1e-6
        assert abs(r["var_y"] - ya.var(ddof=1)) < 1e-4
        assert abs(r["var_y_adj"] - yadj.var(ddof=1)) < 1e-4
        tot_y += r["n_users"] * r["mean_y"]
        tot_adj += r["n_users"] * r["mean_y_adj"]
        tot_n += r["n_users"]
    assert abs(tot_y - tot_adj) / tot_n < 1e-6


def test_holt_recursion_equals_sequential_replay(spark):
    """The engine-owned recursion must walk exactly the textbook
    sequential recurrence — replayed in Python over the same daily
    counts, compared bit-for-bit (alpha/beta are exact binary
    fractions, so no tolerance is needed)."""
    from collections import Counter

    from fuzzy_item_matching_spark.queries.relational import (
        rel_holt_forecast,
    )
    from fuzzy_item_matching_spark.tables import load_table

    days = Counter(
        r["ts"].date()
        for r in load_table(spark, SF_SMOKE, "events")
        .select("ts")
        .collect()
    )
    xs = [float(days[d]) for d in sorted(days)]
    lvl, tr = xs[0], xs[1] - xs[0]
    want = {0: (xs[0], tr, xs[0] + tr)}
    for i in range(1, len(xs)):
        nl = 0.5 * xs[i] + 0.5 * (lvl + tr)
        tr = 0.25 * (nl - lvl) + 0.75 * tr
        lvl = nl
        want[i] = (lvl, tr, lvl + tr)
    got = {
        r["day_idx"]: (r["lvl"], r["trend"], r["fc_next"])
        for r in rel_holt_forecast(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_kmv_anb_exact_below_theta(spark):
    """Theta-sketch difference invariants: estimates are nonnegative;
    whenever both sketches retained their full sets (θ = 1.0) the
    'estimate' must EQUAL the exact anti-join count — below θ the
    sketch sees everything, the unbiasedness argument in miniature."""
    from fuzzy_item_matching_spark.functions.sampling import keyed_uniform
    from fuzzy_item_matching_spark.functions.text import regex_tokenize
    from fuzzy_item_matching_spark.queries.textstats import (
        _ANB_K,
        ts_kmv_anb,
    )
    from fuzzy_item_matching_spark.tables import load_table

    rows = ts_kmv_anb(spark, SF_SMOKE).collect()
    assert rows
    # recompute per-source sketch sizes to find full-retention pairs
    toks = (
        load_table(spark, SF_SMOKE, "documents")
        .select("source", F.explode(regex_tokenize("text")).alias("t"))
        .distinct()
    )
    vocab = {
        r["source"]: r["n"]
        for r in toks.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    full = {s for s, n in vocab.items() if n < _ANB_K}
    saw_exact = 0
    for r in rows:
        assert r["est_anb"] >= 0.0
        assert r["abs_err"] == abs(r["est_anb"] - r["exact_anb"])
        if r["sa"] in full and r["sb"] in full:
            assert r["est_anb"] == float(r["exact_anb"]), r
            saw_exact += 1
    # sf0.001 sources are small: the exact branch must actually fire
    assert saw_exact > 0 or not full


def test_graph_expand_bounded_frontier_and_recall(spark):
    """Structural promise: each query's scored frontier is ≤ G + G²
    candidates regardless of corpus size; and 2-hop expansion must
    recall a nontrivial share of the exact top-k (navigability)."""
    from collections import defaultdict

    from fuzzy_item_matching_spark.functions.vector import (
        cosine_similarity,
    )
    from fuzzy_item_matching_spark.queries.similarity import (
        _GX_G,
        _GX_K,
        _GX_PANEL,
        sim_ann_graph_expand,
    )
    from fuzzy_item_matching_spark.tables import load_table

    got = sim_ann_graph_expand(spark, SF_SMOKE).collect()
    assert got
    per_q = defaultdict(set)
    for r in got:
        per_q[r["qid"]].add(r["nid"])
    assert all(len(v) <= _GX_K for v in per_q.values())
    assert all(q % _GX_PANEL == 0 for q in per_q)
    # exact truth for the panel
    e = load_table(spark, SF_SMOKE, "embeddings")
    q = e.filter(F.col("vec_id") % _GX_PANEL == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    n = e.select(
        F.col("vec_id").alias("nid"), F.col("embedding").alias("nv")
    )
    truth_rows = (
        q.join(n, F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            cosine_similarity(F.col("qv"), F.col("nv")).alias("c"),
        )
        .collect()
    )
    truth = defaultdict(list)
    for r in truth_rows:
        truth[r["qid"]].append((-r["c"], r["nid"]))
    hits = total = 0
    for qid, lst in truth.items():
        lst.sort()
        top = {nid for _, nid in lst[:_GX_K]}
        hits += len(top & per_q.get(qid, set()))
        total += len(top)
    assert total > 0
    assert hits / total >= 0.25, f"recall@{_GX_K} = {hits}/{total}"


def test_skyline_bruteforce_dominance(spark):
    """Every returned (price, size) is non-dominated and every
    excluded distinct pair is dominated — checked against the O(n²)
    definition in plain Python."""
    from fuzzy_item_matching_spark.queries.relational import (
        rel_skyline_parts,
    )
    from fuzzy_item_matching_spark.tables import load_table

    parts = load_table(spark, SF_SMOKE, "part").select(
        "p_retailprice", "p_size"
    ).collect()
    pts = {(round(r["p_retailprice"], 2), r["p_size"]) for r in parts}

    def dominated(p, s):
        return any(
            (p2 <= p and s2 >= s and (p2, s2) != (p, s)) for p2, s2 in pts
        )

    got = {
        (round(r["price"], 2), r["p_size"])
        for r in rel_skyline_parts(spark, SF_SMOKE).collect()
    }
    want = {(p, s) for p, s in pts if not dominated(p, s)}
    assert got == want
    assert got  # frontier is never empty on nonempty input


def test_phonetic_skeleton_groups_vowel_variants(spark):
    """The consonant skeleton must collapse vowel-level misspellings
    and keep consonant-distinct names apart — checked via the query
    over a synthetic part table written to a temp dir."""
    import tempfile

    import pandas as pd

    from fuzzy_item_matching_spark.queries.text import (
        text_phonetic_blocking,
    )

    with tempfile.TemporaryDirectory() as td:
        pd.DataFrame(
            {
                "p_partkey": [1, 2, 3, 4],
                "p_name": [
                    "red gear",
                    "red gere",  # vowel variant → same skeleton
                    "rod gear",  # same skeleton (vowel swap)
                    "red sprocket",  # consonant-distinct
                ],
                "p_brand": ["B"] * 4,
                "p_type": ["t"] * 4,
                "p_size": [1] * 4,
                "p_retailprice": [1.0] * 4,
            }
        ).to_parquet(f"{td}/part.parquet")
        got = {
            r["block_key"]: (r["n_parts"], r["n_names"], r["n_cand_pairs"])
            for r in text_phonetic_blocking(spark, td).collect()
        }
    assert got == {"rd_gr": (3, 3, 3)}  # sprocket block has n=1 → filtered


def test_markov_power_iteration_matches_numpy(spark):
    """Numpy replay: bigram transition matrix, 3 power-iteration steps
    from uniform, dangling mass allowed to leak (no renormalization)."""
    from collections import Counter, defaultdict

    import numpy as np

    from fuzzy_item_matching_spark.queries.analytics import (
        _MK_ITERS,
        rel_markov_stationary,
    )
    from fuzzy_item_matching_spark.tables import load_table

    rows = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    rows.sort(key=lambda r: (r["user_id"], r["ts"], r["event_id"]))
    trans = Counter()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r["event_type"])
    for seq in by_user.values():
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    states = sorted({r["event_type"] for r in rows})
    idx = {s: i for i, s in enumerate(states)}
    P = np.zeros((len(states), len(states)))
    out = Counter()
    for (a, b), c in trans.items():
        out[a] += c
    for (a, b), c in trans.items():
        P[idx[a], idx[b]] = c / out[a]
    v = np.full(len(states), 1.0 / len(states))
    for _ in range(_MK_ITERS):
        v = v @ P
    got = {
        r["event_type"]: r["stationary_prob"]
        for r in rel_markov_stationary(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(states)
    for s in states:
        assert abs(got[s] - v[idx[s]]) < 1e-12, s
    # probability mass can only leak (dangling states), never grow
    assert sum(got.values()) <= 1.0 + 1e-12


def test_removal_attribution_counterfactual_invariants(spark):
    """Structural guarantees of removal-effect attribution: removing
    a channel can only DELETE conversion paths (p_removed ≤ p_full),
    effects are in [0,1], shares are a distribution, and a numpy
    replay of the absorption walk agrees."""
    from collections import Counter, defaultdict

    import numpy as np

    from fuzzy_item_matching_spark.queries.analytics import (
        _RE_CHANNELS,
        _RE_CONV,
        _RE_T,
        rel_markov_removal_attribution,
    )
    from fuzzy_item_matching_spark.tables import load_table

    rows = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    rows.sort(key=lambda r: (r["user_id"], r["ts"], r["event_id"]))
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r["event_type"])
    trans = Counter()
    for seq in by_user.values():
        if _RE_CONV in seq:
            seq = seq[: seq.index(_RE_CONV) + 1]
        prev = "__start"
        for e in seq:
            trans[(prev, e)] += 1
            prev = e
    out = Counter()
    for (a, _), c in trans.items():
        out[a] += c
    P = {(a, b): c / out[a] for (a, b), c in trans.items()}
    P[(_RE_CONV, _RE_CONV)] = 1.0

    def absorb(removed=None):
        v = {"__start": 1.0}
        for _ in range(_RE_T):
            nv = defaultdict(float)
            for (a, b), p in P.items():
                if removed and removed in (a, b):
                    continue
                if a in v:
                    nv[b] += v[a] * p
            v = dict(nv)
        return v.get(_RE_CONV, 0.0)

    p_full = absorb()
    got = {
        r["channel"]: r
        for r in rel_markov_removal_attribution(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(_RE_CHANNELS)
    share_sum = 0.0
    for c in _RE_CHANNELS:
        r = got[c]
        assert abs(r["p_full"] - p_full) < 1e-9
        assert abs(r["p_removed"] - absorb(c)) < 1e-9
        assert r["p_removed"] <= r["p_full"] + 1e-12  # deletion only
        assert -1e-12 <= r["removal_effect"] <= 1.0 + 1e-12
        share_sum += r["share"]
    assert abs(share_sum - 1.0) < 1e-9


def test_kcenter_greedy_matches_numpy_and_2approx(spark):
    """Numpy replay of farthest-point traversal (same start, same
    tie-break) must pick the same centers in the same order, with
    monotonically non-increasing selection radii."""
    import numpy as np

    from fuzzy_item_matching_spark.queries.vectors import (
        _KC_K,
        vec_kcenter_init,
    )
    from fuzzy_item_matching_spark.tables import load_table

    rows = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([[float(x) for x in r["embedding"]] for r in rows])
    order = np.argsort(ids)
    ids, X = ids[order], X[order]
    centers = [0]
    sel_d = [0.0]
    dmin = ((X - X[0]) ** 2).sum(axis=1)
    for _ in range(1, _KC_K):
        best = int(np.lexsort((ids, -dmin))[0])
        centers.append(best)
        sel_d.append(float(dmin[best]))
        dmin = np.minimum(dmin, ((X - X[best]) ** 2).sum(axis=1))
    got = sorted(
        vec_kcenter_init(spark, SF_SMOKE).collect(),
        key=lambda r: r["center_idx"],
    )
    assert [r["vec_id"] for r in got] == [int(ids[c]) for c in centers]
    for r, d in zip(got, sel_d):
        assert abs(r["d2_at_selection"] - d) < 1e-9
    # radii shrink (or tie) as coverage improves — the greedy invariant
    picks = [r["d2_at_selection"] for r in got][1:]
    assert all(a >= b - 1e-12 for a, b in zip(picks, picks[1:]))


def test_km_survival_matches_pure_python_product_limit(spark):
    """Python replay of the product-limit estimator over per-user
    durations (censoring at end of observation), exact equality on
    risk counts and survival within 1e-12."""
    from collections import defaultdict

    from fuzzy_item_matching_spark.queries.training import (
        train_km_survival,
    )
    from fuzzy_item_matching_spark.tables import load_table

    rows = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "ts", "event_type"
    ).collect()
    end = max(r["ts"] for r in rows).date()
    signup, purch = {}, defaultdict(list)
    for r in rows:
        if r["event_type"] == "signup":
            if r["user_id"] not in signup or r["ts"] < signup[r["user_id"]]:
                signup[r["user_id"]] = r["ts"]
        elif r["event_type"] == "purchase":
            purch[r["user_id"]].append(r["ts"])
    durs = []
    for u, s in signup.items():
        ps = [p for p in purch.get(u, []) if p >= s]
        if ps:
            durs.append(((min(ps).date() - s.date()).days, 1))
        else:
            durs.append(((end - s.date()).days, 0))
    days = sorted({t for t, _ in durs})
    surv, want = 1.0, {}
    for t in days:
        n = sum(1 for d, _ in durs if d >= t)
        d = sum(1 for dd, e in durs if dd == t and e == 1)
        h = d / n
        surv = surv * (1.0 - h)
        want[t] = (n, d, surv)
    got = {
        r["t_day"]: (r["n_at_risk"], r["d_events"], r["survival"])
        for r in train_km_survival(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(want)
    for t in want:
        assert got[t][:2] == want[t][:2], t
        assert abs(got[t][2] - want[t][2]) < 1e-12, t
    # survival is a non-increasing probability curve
    curve = [got[t][2] for t in sorted(got)]
    assert all(0.0 <= s <= 1.0 for s in curve)
    assert all(a >= b - 1e-15 for a, b in zip(curve, curve[1:]))


def test_fm_gd_matches_numpy_and_reduces_loss(spark):
    """Numpy replay of the rank-2 FM GD (same init, same O(nk)
    forward/backward, same round-to-9 schedule) must reproduce the
    trace; and the fit must actually reduce squared loss."""
    import numpy as np

    from fuzzy_item_matching_spark.operators.fm import fm_init
    from fuzzy_item_matching_spark.queries.training import (
        _FM_ITERS,
        _FM_K,
        _FM_LR,
        _lr_pairs,
        train_fm_gd,
    )

    feats = ["x1", "x2", "x3"]
    rows = _lr_pairs(spark, SF_SMOKE).select("label", *feats).collect()
    X = np.array([[r[f] for f in feats] for r in rows])
    y = np.array([float(r["label"]) for r in rows])
    init = fm_init(3, _FM_K)
    w0 = init["w0"]
    w = np.array([init[f"w{j}"] for j in (1, 2, 3)])
    V = np.array(
        [[init[f"v{j}{f}"] for f in range(1, _FM_K + 1)] for j in (1, 2, 3)]
    )

    def predict():
        S = X @ V  # (n, k)
        Q = (X**2) @ (V**2)
        return w0 + X @ w + 0.5 * ((S**2) - Q).sum(axis=1)

    losses = [float(((predict() - y) ** 2).mean())]
    want = {}
    for t in range(1, _FM_ITERS + 1):
        g = predict() - y
        n = len(y)
        w0 = round(w0 - _FM_LR * g.sum() / n, 9)
        S = X @ V
        gw = (g[:, None] * X).sum(axis=0) / n
        gV = (
            g[:, None, None]
            * (X[:, :, None] * S[:, None, :] - V[None] * (X**2)[:, :, None])
        ).sum(axis=0) / n
        w = np.round(w - _FM_LR * gw, 9)
        V = np.round(V - _FM_LR * gV, 9)
        want[(t, "w0")] = w0
        for j in (1, 2, 3):
            want[(t, f"w{j}")] = w[j - 1]
            for f in range(1, _FM_K + 1):
                want[(t, f"v{j}{f}")] = V[j - 1, f - 1]
        losses.append(float(((predict() - y) ** 2).mean()))
    got = {
        (r["iter"], r["coef"]): r["weight"]
        for r in train_fm_gd(spark, SF_SMOKE).collect()
    }
    assert set(got) == set(want)
    for kk in want:
        assert abs(got[kk] - want[kk]) < 1e-7, (kk, got[kk], want[kk])
    assert losses[-1] < losses[0]  # the fit moves downhill


def test_good_turing_matches_counter_replay(spark):
    """Counter replay of the frequency-of-frequencies table, the
    Turing estimate, and the unseen mass."""
    from collections import Counter

    from fuzzy_item_matching_spark.functions.text import regex_tokenize
    from fuzzy_item_matching_spark.queries.textstats import ts_good_turing
    from fuzzy_item_matching_spark.tables import load_table

    toks = (
        load_table(spark, SF_SMOKE, "documents")
        .select(F.explode(regex_tokenize("text")).alias("t"))
        .collect()
    )
    tc = Counter(r["t"] for r in toks)
    fof = Counter(tc.values())
    n = sum(tc.values())
    got = {r["r"]: r for r in ts_good_turing(spark, SF_SMOKE).collect()}
    assert set(got) == set(fof)
    for r, n_r in fof.items():
        row = got[r]
        assert row["n_r"] == n_r
        want_star = (r + 1.0) * fof.get(r + 1, 0) / n_r if (r + 1) in fof else 0.0
        assert abs(row["r_star"] - want_star) < 1e-12
        assert abs(row["p_unseen"] - fof.get(1, 0) / n) < 1e-15


def test_pit_features_are_strictly_prior(spark):
    """Leakage check by construction: replay per-user cumulative
    state in Python and verify every training row's features count
    only STRICTLY earlier events."""
    from collections import defaultdict
    from decimal import Decimal

    from fuzzy_item_matching_spark.queries.training import (
        _PIT_LABEL_THR,
        train_pit_features,
    )
    from fuzzy_item_matching_spark.tables import load_table

    rows = load_table(spark, SF_SMOKE, "events").collect()
    rows.sort(key=lambda r: (r["user_id"], r["ts"], r["event_id"]))
    state = defaultdict(lambda: [0, Decimal(0), 0])  # n, sum, n_purch
    want = {}
    for r in rows:
        st = state[r["user_id"]]
        if r["event_type"] == "purchase":
            v = Decimal(str(r["value"])).quantize(Decimal("0.01"))
            want[r["event_id"]] = (
                r["user_id"],
                st[0],
                float(st[1]),
                st[2],
                1 if v > Decimal(_PIT_LABEL_THR) else 0,
            )
        st[0] += 1
        st[1] += Decimal(str(r["value"])).quantize(Decimal("0.01"))
        if r["event_type"] == "purchase":
            st[2] += 1
    got = {
        r["event_id"]: (
            r["user_id"],
            r["n_prior_events"],
            r["prior_value_sum"],
            r["n_prior_purchases"],
            r["label"],
        )
        for r in train_pit_features(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_js_divergence_matches_scipy_style_replay(spark):
    """Full-vocab numpy replay (union vocabulary, no shared-only
    shortcut) must agree with the shared-join identity; JSD bounded
    by ln 2 and symmetric by construction."""
    import math
    from collections import Counter, defaultdict

    from fuzzy_item_matching_spark.functions.text import regex_tokenize
    from fuzzy_item_matching_spark.queries.textstats import (
        ts_js_divergence,
    )
    from fuzzy_item_matching_spark.tables import load_table

    toks = (
        load_table(spark, SF_SMOKE, "documents")
        .select("source", F.explode(regex_tokenize("text")).alias("t"))
        .collect()
    )
    cnt = defaultdict(Counter)
    for r in toks:
        cnt[r["source"]][r["t"]] += 1
    got = {
        (r["sa"], r["sb"]): r["jsd"]
        for r in ts_js_divergence(spark, SF_SMOKE).collect()
    }
    assert got
    for (sa, sb), jsd in got.items():
        pa, pb = cnt[sa], cnt[sb]
        na, nb = sum(pa.values()), sum(pb.values())
        want = 0.0
        for t in set(pa) | set(pb):
            p = pa.get(t, 0) / na
            q = pb.get(t, 0) / nb
            m = (p + q) / 2.0
            if p:
                want += 0.5 * p * math.log(p / m)
            if q:
                want += 0.5 * q * math.log(q / m)
        assert abs(jsd - want) < 1e-9, (sa, sb)
        assert -1e-12 <= jsd <= math.log(2.0) + 1e-12


def test_bitmap_overlap_equals_set_intersections(spark):
    """Set replay: per-brand customer sets from the raw join, pairwise
    intersections and Jaccard must match the bitmap algebra exactly."""
    from collections import defaultdict

    from fuzzy_item_matching_spark.queries.relational import (
        rel_bitmap_overlap,
    )
    from fuzzy_item_matching_spark.tables import load_table

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey"
    )
    p = load_table(spark, SF_SMOKE, "part").select("p_partkey", "p_brand")
    rows = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .select("p_brand", "o_custkey")
        .collect()
    )
    sets = defaultdict(set)
    for r in rows:
        sets[r["p_brand"]].add(r["o_custkey"])
    got = {
        (r["brand_a"], r["brand_b"]): r
        for r in rel_bitmap_overlap(spark, SF_SMOKE).collect()
    }
    brands = sorted(sets)
    n_checked = 0
    for i, a in enumerate(brands):
        for b in brands[i + 1 :]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                assert (a, b) not in got
                continue
            r = got[(a, b)]
            assert r["n_a"] == len(sets[a])
            assert r["n_b"] == len(sets[b])
            assert r["n_common"] == inter
            assert abs(
                r["jaccard"] - inter / len(sets[a] | sets[b])
            ) < 1e-12
            n_checked += 1
    assert n_checked > 0


def test_dp_noise_is_calibrated_laplace_replay(spark):
    """Python replay of the inverse-CDF Laplace draw (same md5
    uniform, same scale b = 1/eps); noisy − true must equal the
    replayed noise exactly, and the mechanism must actually perturb."""
    import hashlib
    import math

    from fuzzy_item_matching_spark.queries.training import (
        _DP_EPS,
        _DP_SEED,
        train_dp_noisy_counts,
    )

    rows = train_dp_noisy_counts(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        h = hashlib.md5(f"{_DP_SEED}:{r['p_brand']}".encode()).hexdigest()
        x = (int(h[:8], 16) + 0.5) / 2**32 - 0.5
        want = -(1.0 / _DP_EPS) * (1.0 if x >= 0 else -1.0) * math.log(
            1.0 - 2.0 * abs(x)
        )
        assert abs((r["noisy_count"] - r["true_count"]) - want) < 1e-9
        # (true + noise) - true reassociates, so compare with tolerance
        assert abs(r["abs_noise"] - abs(want)) < 1e-9
    assert any(r["abs_noise"] > 1e-6 for r in rows)


def test_pca_deflation_components_orthogonal_and_match_numpy(spark):
    """v1 must equal vec_pca_power's direction; v2 must be ~orthogonal
    to v1 and agree with numpy power iteration over the deflated
    quantized Gram (same fixed-point quantum, same iteration count)."""
    import numpy as np

    from fuzzy_item_matching_spark.queries.vectors import (
        _PCA_ITERS,
        _PCA_Q,
        vec_pca_deflation,
    )
    from fuzzy_item_matching_spark.tables import load_table

    rows = load_table(spark, SF_SMOKE, "embeddings").select(
        "embedding"
    ).collect()
    X = np.array([[float(x) for x in r["embedding"]] for r in rows])
    n, d = X.shape
    C = np.floor(np.einsum("ni,nj->nij", X, X) * _PCA_Q).sum(0) / _PCA_Q / n

    def power(C):
        v = np.ones(d)
        for _ in range(_PCA_ITERS):
            w = C @ v
            nrm = float(np.sqrt((w * w).sum()))
            v = w / nrm
        return v, nrm

    v1, e1 = power(C)
    v2, e2 = power(C - e1 * np.outer(v1, v1))
    got = vec_pca_deflation(spark, SF_SMOKE).collect()
    g1 = np.zeros(d)
    g2 = np.zeros(d)
    for r in got:
        (g1 if r["component"] == 1 else g2)[r["dim_idx"]] = r["loading"]
    assert np.allclose(g1, v1, atol=1e-6)
    assert np.allclose(g2, v2, atol=1e-4)
    # 3 power iterations leave residual overlap on this flat spectrum;
    # correctness is the numpy agreement above — this pins the trend
    assert abs(float(g1 @ g2)) < 0.3
    eigs = {r["component"]: r["eigenvalue"] for r in got}
    assert eigs[1] >= eigs[2] > 0


def test_textrank_matches_networkx_style_replay(spark):
    """Pure-python PageRank over the same co-occurrence graph (same
    damping, same iteration count, same start) must reproduce the
    top-k ranking and scores."""
    from collections import Counter, defaultdict

    from fuzzy_item_matching_spark.functions.text import (
        ENGLISH_STOPWORDS,
        regex_tokenize,
    )
    from fuzzy_item_matching_spark.queries.textstats import (
        _TR_DAMP,
        _TR_ITERS,
        _TR_MINLEN,
        _TR_TOPK,
        ts_textrank_terms,
    )
    from fuzzy_item_matching_spark.tables import load_table

    stop = set(ENGLISH_STOPWORDS)
    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", regex_tokenize("text").alias("t"))
        .collect()
    )
    w = Counter()
    for r in docs:
        seq = [t for t in r["t"] if len(t) >= _TR_MINLEN and t not in stop]
        for a, b in zip(seq, seq[1:]):
            if a != b:
                w[(a, b)] += 1
                w[(b, a)] += 1
    outw = defaultdict(float)
    for (a, _), c in w.items():
        outw[a] += c
    nodes = sorted(outw)
    n = float(len(nodes))
    r = {t: 1.0 / n for t in nodes}
    for _ in range(_TR_ITERS):
        nr = defaultdict(float)
        for (a, b), c in w.items():
            nr[b] += r[a] * c / outw[a]
        r = {t: (1.0 - _TR_DAMP) / n + _TR_DAMP * nr[t] for t in nodes}
    want = sorted(r.items(), key=lambda kv: (-kv[1], kv[0]))[:_TR_TOPK]
    got = sorted(
        ts_textrank_terms(spark, SF_SMOKE).collect(),
        key=lambda row: row["rnk"],
    )
    assert [g["term"] for g in got] == [t for t, _ in want]
    for g, (_, s) in zip(got, want):
        assert abs(g["score"] - s) < 1e-9


def test_uncertainty_batch_is_the_boundary_set(spark):
    """The selected batch must be exactly the k pairs with minimal
    |score − 0.5| under the documented tie order, scored through the
    same memoized weights."""
    from fuzzy_item_matching_spark.queries.training import (
        _AL_BATCH,
        _lr_pairs,
        _lr_weights,
        train_uncertainty_batch,
    )
    import math

    w = _lr_weights(spark, SF_SMOKE)
    rows = _lr_pairs(spark, SF_SMOKE).select(
        "id_a", "id_b", "x1", "x2", "x3"
    ).collect()
    scored = []
    for r in rows:
        z = (
            w["w0"]
            + w["w1"] * r["x1"]
            + w["w2"] * r["x2"]
            + w["w3"] * r["x3"]
        )
        p = round(1.0 / (1.0 + math.exp(-z)), 9)
        scored.append((abs(p - 0.5), r["id_a"], r["id_b"], p))
    scored.sort()
    want = [(a, b) for _, a, b, _ in scored[:_AL_BATCH]]
    got = sorted(
        train_uncertainty_batch(spark, SF_SMOKE).collect(),
        key=lambda r: r["rnk"],
    )
    assert [(r["id_a"], r["id_b"]) for r in got] == want
    uncs = [r["uncertainty"] for r in got]
    assert uncs == sorted(uncs)


def test_cost_threshold_is_the_sweep_argmin(spark):
    """Brute-force the cost over every candidate threshold in Python
    and confirm the query returns the argmin under the tie order."""
    import math

    from fuzzy_item_matching_spark.queries.training import (
        _CT_C_FN,
        _CT_C_FP,
        _lr_pairs,
        _lr_weights,
        train_cost_threshold,
    )

    w = _lr_weights(spark, SF_SMOKE)
    rows = _lr_pairs(spark, SF_SMOKE).select(
        "label", "x1", "x2", "x3"
    ).collect()
    scored = []
    for r in rows:
        z = (
            w["w0"]
            + w["w1"] * r["x1"]
            + w["w2"] * r["x2"]
            + w["w3"] * r["x3"]
        )
        scored.append((round(1.0 / (1.0 + math.exp(-z)), 9), r["label"]))
    best = None
    for thr in sorted({s for s, _ in scored}):
        fp = sum(1 for s, y in scored if s >= thr and y == 0)
        fn = sum(1 for s, y in scored if s < thr and y == 1)
        cost = _CT_C_FP * fp + _CT_C_FN * fn
        cand = (cost, thr, fp, fn)
        if best is None or cand < best:
            best = cand
    [got] = train_cost_threshold(spark, SF_SMOKE).collect()
    cost, thr, fp, fn = best
    assert got["threshold"] == thr
    assert (got["n_fp"], got["n_fn"], got["expected_cost"]) == (fp, fn, cost)


def test_burrows_delta_matches_numpy_replay(spark):
    """Numpy replay: top-M terms, per-source relative freqs, sample
    z-scores, mean absolute z-difference — plus symmetry/nonnegativity
    and the triangle-ish sanity that identical profiles give 0."""
    from collections import Counter, defaultdict

    import numpy as np

    from fuzzy_item_matching_spark.functions.text import regex_tokenize
    from fuzzy_item_matching_spark.queries.textstats import (
        _BD_TOP,
        ts_burrows_delta,
    )
    from fuzzy_item_matching_spark.tables import load_table

    toks = (
        load_table(spark, SF_SMOKE, "documents")
        .select("source", F.explode(regex_tokenize("text")).alias("t"))
        .collect()
    )
    cnt = defaultdict(Counter)
    for r in toks:
        cnt[r["source"]][r["t"]] += 1
    glob = Counter()
    for c in cnt.values():
        glob.update(c)
    top = sorted(glob, key=lambda t: (-glob[t], t))[:_BD_TOP]
    sources = sorted(cnt)
    F_ = np.array(
        [
            [cnt[s].get(t, 0) / sum(cnt[s].values()) for t in top]
            for s in sources
        ]
    )
    mu = F_.mean(axis=0)
    sd = F_.std(axis=0, ddof=1)
    Z = np.where(sd > 0, (F_ - mu) / np.where(sd == 0, 1, sd), 0.0)
    got = {
        (r["sa"], r["sb"]): r["delta"]
        for r in ts_burrows_delta(spark, SF_SMOKE).collect()
    }
    assert len(got) == len(sources) * (len(sources) - 1) // 2
    for i, sa in enumerate(sources):
        for j in range(i + 1, len(sources)):
            sb = sources[j]
            want = float(np.abs(Z[i] - Z[j]).mean())
            assert abs(got[(sa, sb)] - want) < 1e-9, (sa, sb)
            assert got[(sa, sb)] >= 0.0


def test_decile_lift_invariants_and_python_replay(spark):
    """Replay the gains chart in Python: same total order, same ntile
    semantics (ties to earlier buckets, sizes differ by ≤1); cum
    capture ends at 1.0 and is non-decreasing; lift starts ≥ 1 for a
    better-than-random model (checked via AUC>0.5 on the same scores)."""
    import math

    from fuzzy_item_matching_spark.queries.training import (
        _LIFT_BUCKETS,
        _lr_pairs,
        _lr_weights,
        train_decile_lift,
    )

    w = _lr_weights(spark, SF_SMOKE)
    rows = _lr_pairs(spark, SF_SMOKE).select(
        "label", "id_a", "id_b", "x1", "x2", "x3"
    ).collect()
    scored = []
    for r in rows:
        z = (
            w["w0"]
            + w["w1"] * r["x1"]
            + w["w2"] * r["x2"]
            + w["w3"] * r["x3"]
        )
        p = round(1.0 / (1.0 + math.exp(-z)), 9)
        scored.append((-p, r["id_a"], r["id_b"], r["label"]))
    scored.sort()
    n = len(scored)
    # ntile: first (n % b) buckets get ceil(n/b), rest floor(n/b)
    b = _LIFT_BUCKETS
    sizes = [(n // b) + (1 if i < n % b else 0) for i in range(b)]
    want, pos_all, idx = [], sum(s[3] for s in scored), 0
    cum_pos = cum_n = 0
    for d, sz in enumerate(sizes, start=1):
        chunk = scored[idx : idx + sz]
        idx += sz
        npos = sum(c[3] for c in chunk)
        cum_pos += npos
        cum_n += sz
        want.append((d, sz, npos, cum_pos / pos_all,
                     (cum_pos / cum_n) / (pos_all / n)))
    got = sorted(
        train_decile_lift(spark, SF_SMOKE).collect(),
        key=lambda r: r["decile"],
    )
    assert len(got) == b
    for g, (d, sz, npos, cap, lift) in zip(got, want):
        assert (g["decile"], g["n"], g["n_pos"]) == (d, sz, npos)
        assert abs(g["cum_capture"] - cap) < 1e-12
        assert abs(g["cum_lift"] - lift) < 1e-12
    assert abs(got[-1]["cum_capture"] - 1.0) < 1e-12
    caps = [g["cum_capture"] for g in got]
    assert caps == sorted(caps)


def test_abc_classes_partition_the_revenue(spark):
    """Python replay of the Pareto walk: class sets must partition the
    part domain, shares must sum to 1, and A's per-item revenue must
    dominate C's (the 80/20 structure the cut exists to expose)."""
    from decimal import Decimal

    from fuzzy_item_matching_spark.queries.relational import (
        _ABC_A,
        _ABC_B,
        rel_abc_classes,
    )
    from fuzzy_item_matching_spark.tables import load_table

    rows = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_partkey", "l_extendedprice"
    ).collect()
    rev = {}
    for r in rows:
        rev[r["l_partkey"]] = rev.get(r["l_partkey"], Decimal(0)) + Decimal(
            str(r["l_extendedprice"])
        ).quantize(Decimal("0.01"))
    tot = float(sum(rev.values()))
    ranked = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
    want = {"A": [0, Decimal(0)], "B": [0, Decimal(0)], "C": [0, Decimal(0)]}
    cum = Decimal(0)
    for pk, r in ranked:
        cum += r
        share = float(cum) / tot
        cls = "A" if share <= _ABC_A else ("B" if share <= _ABC_B else "C")
        want[cls][0] += 1
        want[cls][1] += r
    got = {r["abc"]: r for r in rel_abc_classes(spark, SF_SMOKE).collect()}
    assert set(got) == {k for k, v in want.items() if v[0] > 0}
    for cls, (n, r) in want.items():
        if n == 0:
            continue
        assert got[cls]["n_parts"] == n
        assert abs(got[cls]["revenue"] - float(r)) < 1e-6
    assert abs(sum(g["revenue_share"] for g in got.values()) - 1.0) < 1e-12
    if "A" in got and "C" in got:
        per_a = got["A"]["revenue"] / got["A"]["n_parts"]
        per_c = got["C"]["revenue"] / got["C"]["n_parts"]
        assert per_a > per_c


def test_file_metadata_counts_and_layout(spark):
    """The _metadata audit must reproduce the per-status counts from
    the source table and certify the one-file-per-partition layout."""
    from fuzzy_item_matching_spark.queries.sources import (
        src_file_metadata,
    )
    from fuzzy_item_matching_spark.tables import load_table

    want = {
        r["o_orderstatus"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {r["status"]: r for r in src_file_metadata(spark, SF_SMOKE).collect()}
    assert set(got) == set(want)
    for s, n in want.items():
        assert got[s]["n_rows"] == n
        assert got[s]["n_files"] == 1
