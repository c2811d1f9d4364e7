"""Round-14 operator contracts.

Oracle-INDEPENDENT replay tests for the round's births: every new
query family is recomputed from first principles (numpy/pandas over
the same parquet, or closed-form hand math) so a semantic bug shared
by both engines — the failure mode the r13 RAKE replay caught — has a
third, independent witness. Plus the r13-VERDICT pins: the multiprobe
recall curve must be monotone in the probe budget and must not fall
below the committed 0.713 at T=13, and the Adamic–Adar cap eval must
report the measured fidelity contract (recall 0 at cap 32, high
effectiveness growth with cap).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from .conftest import SF_CHECK


def _pdf(duck, sql):
    return duck.execute(sql).fetchdf()


# ---------------------------------------------------------------------------
# Rank / association family
# ---------------------------------------------------------------------------


def test_kendall_tau_brute_force_replay(spark, duck):
    """tau-b from the contingency-table pair join must equal the
    O(n²) textbook definition computed over raw rows."""
    from fuzzy_item_matching_spark.queries.training import (
        _KT_BUCKET,
        train_kendall_tau,
    )

    [row] = train_kendall_tau(spark, SF_CHECK).collect()
    p = _pdf(duck, "SELECT p_size, p_retailprice FROM part")
    x = p["p_size"].to_numpy()
    y = np.floor(
        p["p_retailprice"].astype(float).round(2).to_numpy() / _KT_BUCKET
    ).astype(int)
    n = len(x)
    c = d = 0
    for i in range(n):
        dx = x[i + 1 :] - x[i]
        dy = y[i + 1 :] - y[i]
        c += int(((dx > 0) & (dy > 0)).sum() + ((dx < 0) & (dy < 0)).sum())
        d += int(((dx > 0) & (dy < 0)).sum() + ((dx < 0) & (dy > 0)).sum())
    n0 = n * (n - 1) / 2
    n1 = sum(t * (t - 1) // 2 for t in pd.Series(x).value_counts())
    n2 = sum(t * (t - 1) // 2 for t in pd.Series(y).value_counts())
    tau = (c - d) / math.sqrt((n0 - n1) * (n0 - n2))
    assert row["concordant"] == c and row["discordant"] == d
    assert row["tau_b"] == pytest.approx(tau, abs=1e-8)


def test_mann_whitney_scipy_free_replay(spark, duck):
    """U and z from the distinct-value rank windows must equal the
    raw average-rank computation."""
    from fuzzy_item_matching_spark.queries.training import train_mann_whitney

    [row] = train_mann_whitney(spark, SF_CHECK).collect()
    o = _pdf(duck, "SELECT o_orderkey, o_totalprice FROM orders")
    v = o["o_totalprice"].astype(float).round(2).to_numpy()
    g = (o["o_orderkey"].to_numpy() % 2).astype(int)
    order = np.argsort(v, kind="stable")
    ranks = np.empty(len(v))
    sv = v[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0  # average rank of the tie run
        i = j
    n1 = int((g == 0).sum())
    n2 = int((g == 1).sum())
    r1 = float(ranks[g == 0].sum())
    u1 = r1 - n1 * (n1 + 1) / 2.0
    _, counts = np.unique(v, return_counts=True)
    tie3 = float((counts.astype(np.int64) ** 3 - counts).sum())
    nn = n1 + n2
    sig2 = n1 * n2 / 12.0 * ((nn + 1) - tie3 / (nn * (nn - 1)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(sig2)
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["u1"] == pytest.approx(u1, abs=1e-6)
    assert row["z"] == pytest.approx(z, abs=1e-8)


def test_wilcoxon_replay(spark, duck):
    from fuzzy_item_matching_spark.queries.training import (
        train_wilcoxon_signed_rank,
    )

    [row] = train_wilcoxon_signed_rank(spark, SF_CHECK).collect()
    o = _pdf(
        duck,
        """SELECT o_custkey,
           COALESCE(SUM(CASE WHEN o_orderkey % 2 = 0
                        THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0)
           - COALESCE(SUM(CASE WHEN o_orderkey % 2 = 1
                          THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 0)
             AS d
           FROM orders GROUP BY 1""",
    )
    d = o["d"].astype(float).round(2).to_numpy()
    d = d[d != 0]
    ad = np.abs(d)
    order = np.argsort(ad, kind="stable")
    ranks = np.empty(len(ad))
    sv = ad[order]
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    n = len(d)
    w_plus = float(ranks[d > 0].sum())
    _, counts = np.unique(ad, return_counts=True)
    tie3 = float((counts.astype(np.int64) ** 3 - counts).sum())
    sig2 = n * (n + 1) * (2 * n + 1) / 24.0 - tie3 / 48.0
    z = (w_plus - n * (n + 1) / 4.0) / math.sqrt(sig2)
    assert row["n"] == n
    assert row["w_plus"] == pytest.approx(w_plus, abs=1e-6)
    assert row["z"] == pytest.approx(z, abs=1e-8)


def test_cramers_v_replay(spark, duck):
    from fuzzy_item_matching_spark.queries.training import train_cramers_v

    [row] = train_cramers_v(spark, SF_CHECK).collect()
    c = _pdf(duck, "SELECT c_nationkey, c_mktsegment FROM customer")
    ct = pd.crosstab(c["c_nationkey"], c["c_mktsegment"]).to_numpy()
    n = ct.sum()
    exp = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / n
    chi2 = float(((ct - exp) ** 2 / exp).sum())
    v = math.sqrt(chi2 / (n * min(ct.shape[0] - 1, ct.shape[1] - 1)))
    assert row["n"] == n
    assert (row["r"], row["c"]) == ct.shape
    assert row["chi2"] == pytest.approx(chi2, abs=1e-6)
    assert row["v"] == pytest.approx(v, abs=1e-9)


# ---------------------------------------------------------------------------
# Regression diagnostics on the daily series
# ---------------------------------------------------------------------------


def _daily(duck):
    d = _pdf(
        duck,
        """SELECT o_orderdate AS d, SUM(CAST(o_totalprice AS DECIMAL(18,2)))
           AS y FROM orders GROUP BY 1 ORDER BY 1""",
    )
    y = d["y"].astype(float).to_numpy()
    x = np.arange(1, len(y) + 1, dtype=float)
    return d["d"].to_numpy(), x, y


def _ols(x, y):
    n = len(x)
    b = (np.sum(x * y) - x.sum() * y.sum() / n) / (
        np.sum(x * x) - x.sum() ** 2 / n
    )
    a = y.sum() / n - b * x.sum() / n
    return a, b


def test_durbin_watson_replay(spark, duck):
    from fuzzy_item_matching_spark.queries.training import train_durbin_watson

    [row] = train_durbin_watson(spark, SF_CHECK).collect()
    _, x, y = _daily(duck)
    a, b = _ols(x, y)
    e = y - (a + b * x)
    dw = float(np.sum(np.diff(e) ** 2) / np.sum(e * e))
    assert row["n_days"] == len(x)
    assert row["slope"] == pytest.approx(b, rel=1e-9)
    assert row["intercept"] == pytest.approx(a, rel=1e-9)
    assert row["dw"] == pytest.approx(dw, abs=1e-6)
    # daily revenue is serially near-independent synthetic data: DW
    # must sit in the no-autocorrelation band, not at the rails
    assert 1.0 < row["dw"] < 3.0


def test_chow_replay(spark, duck):
    from fuzzy_item_matching_spark.queries.training import (
        _DW_SPLIT,
        train_chow_test,
    )

    [row] = train_chow_test(spark, SF_CHECK).collect()
    dates, x, y = _daily(duck)
    split = np.datetime64(_DW_SPLIT)
    seg = dates.astype("datetime64[D]") >= split
    a, b = _ols(x, y)
    ssr_p = float(np.sum((y - a - b * x) ** 2))
    ssr_s = 0.0
    for s in (False, True):
        xs, ys = x[seg == s], y[seg == s]
        aa, bb = _ols(xs, ys)
        ssr_s += float(np.sum((ys - aa - bb * xs) ** 2))
    f = ((ssr_p - ssr_s) / 2.0) / (ssr_s / (len(x) - 4.0))
    assert row["n1"] + row["n2"] == len(x)
    assert row["ssr_pooled"] == pytest.approx(ssr_p, rel=1e-9)
    assert row["ssr_split"] == pytest.approx(ssr_s, rel=1e-9)
    assert row["f_stat"] == pytest.approx(f, rel=1e-6)
    # split fit can never be worse than pooled (nested models)
    assert row["ssr_split"] <= row["ssr_pooled"]


def test_poisson_irls_replay(spark, duck):
    """Replay the two IRLS steps in numpy (same update algebra, free
    float order) and pin the likelihood direction: each step must
    not increase the Poisson deviance."""
    from fuzzy_item_matching_spark.queries.training import train_poisson_irls

    rows = {
        r["iter"]: (r["b0"], r["b1"])
        for r in train_poisson_irls(spark, SF_CHECK).collect()
    }
    d = _pdf(
        duck,
        """SELECT COALESCE(o.cnt, 0) AS y,
           CAST(c.c_acctbal AS DOUBLE) / 1000.0 AS x
           FROM customer c LEFT JOIN (
             SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY 1
           ) o ON o.o_custkey = c.c_custkey""",
    )
    y = d["y"].astype(float).to_numpy()
    x = d["x"].astype(float).to_numpy()
    b0, b1 = round(math.log(y.mean()), 9), 0.0
    betas = {}
    for it in (1, 2):
        eta = b0 + b1 * x
        mu = np.exp(eta)
        z = eta + (y - mu) / mu
        sw, swx = mu.sum(), (mu * x).sum()
        swxx, swz, swxz = (mu * x * x).sum(), (mu * z).sum(), (mu * x * z).sum()
        b1 = (sw * swxz - swx * swz) / (sw * swxx - swx * swx)
        b0 = (swz - b1 * swx) / sw
        b0, b1 = round(b0, 9), round(b1, 9)
        betas[it] = (b0, b1)
    for it in (1, 2):
        assert rows[it][0] == pytest.approx(betas[it][0], abs=1e-6)
        assert rows[it][1] == pytest.approx(betas[it][1], abs=1e-6)

    def deviance(b0_, b1_):
        mu = np.exp(b0_ + b1_ * x)
        with np.errstate(divide="ignore", invalid="ignore"):
            term = np.where(y > 0, y * np.log(y / mu), 0.0)
        return float(2 * np.sum(term - (y - mu)))

    d0 = deviance(round(math.log(y.mean()), 9), 0.0)
    d1 = deviance(*rows[1])
    d2 = deviance(*rows[2])
    assert d1 <= d0 and d2 <= d1 + 1e-6


def test_rbo_replay_and_bounds(spark, duck):
    from fuzzy_item_matching_spark.queries.training import (
        _RBO_K,
        _RBO_P,
        _RBO_SPLIT,
        train_rbo,
    )

    [row] = train_rbo(spark, SF_CHECK).collect()
    revs = _pdf(
        duck,
        f"""SELECT l_partkey AS pk,
            CASE WHEN l_shipdate < DATE '{_RBO_SPLIT}' THEN 0 ELSE 1 END
              AS half,
            SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
            FROM lineitem GROUP BY 1, 2""",
    )

    def topk(h):
        sub = revs[revs["half"] == h].copy()
        sub["rev"] = sub["rev"].astype(float)
        sub = sub.sort_values(["rev", "pk"], ascending=[False, True])
        return {pk: i + 1 for i, pk in enumerate(sub["pk"].head(_RBO_K))}

    ra, rb = topk(0), topk(1)
    common = set(ra) & set(rb)
    # per-item tail-weight formulation == the per-depth definition
    rbo = 0.0
    for d in range(1, _RBO_K + 1):
        inter = sum(1 for pk in common if max(ra[pk], rb[pk]) <= d)
        rbo += (1 - _RBO_P) * (_RBO_P ** (d - 1)) * inter / d
    assert row["overlap"] == len(common)
    assert row["rbo"] == pytest.approx(rbo, abs=1e-6)
    assert 0.0 <= row["rbo"] <= 1.0


# ---------------------------------------------------------------------------
# Corpus curation family
# ---------------------------------------------------------------------------


def test_readability_replay(spark, duck):
    import re

    from fuzzy_item_matching_spark.queries.textstats import ts_readability

    got = {
        r["band"]: (r["n_docs"], r["avg_fre"])
        for r in ts_readability(spark, SF_CHECK).collect()
    }
    docs = _pdf(duck, "SELECT text FROM documents")
    bands: dict[str, list[float]] = {}
    for t in docs["text"].fillna(""):
        words = re.findall(r"[a-z]+", t.lower())
        if not words:
            continue
        s = max(1, len(re.findall(r"[.!?]+", t)))
        syl = sum(max(1, len(re.findall(r"[aeiouy]+", w))) for w in words)
        f = 206.835 - 1.015 * (len(words) / s) - 84.6 * (syl / len(words))
        for th, name in (
            (90, "very_easy"), (80, "easy"), (70, "fairly_easy"),
            (60, "standard"), (50, "fairly_difficult"), (30, "difficult"),
            (0, "very_confusing"),
        ):
            if f >= th:
                bands.setdefault(name, []).append(f)
                break
        else:
            bands.setdefault("graduate", []).append(f)
    assert set(got) == set(bands)
    for band, vals in bands.items():
        assert got[band][0] == len(vals)
        assert got[band][1] == pytest.approx(
            sum(vals) / len(vals), abs=1e-6
        )


def test_tokenizer_fertility_replay(spark, duck):
    import re

    from fuzzy_item_matching_spark.queries.text import (
        _BPE_MERGES,
        _BPE_PASSES,
    )
    from fuzzy_item_matching_spark.queries.textstats import (
        ts_tokenizer_fertility,
    )

    got = {
        r["lang"]: (r["n_words"], r["n_pieces"], r["fertility"])
        for r in ts_tokenizer_fertility(spark, SF_CHECK).collect()
    }
    docs = _pdf(duck, "SELECT lang, text FROM documents")
    agg: dict[str, list[int]] = {}
    for lang, t in zip(docs["lang"], docs["text"].fillna("")):
        for w in re.split(r"[^\w\d]", t.lower()):
            if not w:
                continue
            s = " " + " ".join(w) + " "
            for a, b in _BPE_MERGES:
                for _ in range(_BPE_PASSES):
                    s = s.replace(f" {a} ", f" {b} ")
            np_ = len(s.split())
            cur = agg.setdefault(lang, [0, 0])
            cur[0] += 1
            cur[1] += np_
    assert set(got) == set(agg)
    for lang, (nw, npieces) in agg.items():
        assert got[lang][0] == nw and got[lang][1] == npieces
        assert got[lang][2] == pytest.approx(npieces / nw, abs=1e-9)
        assert got[lang][2] >= 1.0  # a word is at least one piece


def test_seasonal_decompose_centering_and_replay(spark, duck):
    from fuzzy_item_matching_spark.queries.relational import (
        rel_seasonal_decompose,
    )

    rows = rel_seasonal_decompose(spark, SF_CHECK).collect()
    assert len(rows) == 12
    # centering: the 12 indices must sum to ~0 by construction
    assert sum(r["seasonal_index"] for r in rows) == pytest.approx(
        0.0, abs=1e-4
    )
    m = _pdf(
        duck,
        """SELECT date_trunc('month', o_orderdate) AS m,
           month(o_orderdate) AS moy,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y
           FROM orders GROUP BY 1, 2 ORDER BY 1""",
    )
    y = m["y"].to_numpy()
    trend = np.full(len(y), np.nan)
    for t in range(6, len(y) - 6):
        trend[t] = (
            0.5 * y[t - 6] + y[t - 5 : t + 6].sum() + 0.5 * y[t + 6]
        ) / 12.0
    dtr = y - trend
    moy = m["moy"].to_numpy()
    raw = {
        mm: float(np.nanmean(dtr[moy == mm])) for mm in range(1, 13)
    }
    mean_s = sum(raw.values()) / 12.0
    for r in rows:
        assert r["seasonal_index"] == pytest.approx(
            raw[r["moy"]] - mean_s, abs=1e-3
        )


def test_rfm_segmentation_conservation(spark, duck):
    from fuzzy_item_matching_spark.queries.relational import (
        rel_rfm_segmentation,
    )

    rows = rel_rfm_segmentation(spark, SF_CHECK).collect()
    n_cust = duck.execute(
        "SELECT COUNT(DISTINCT o_custkey) FROM orders"
    ).fetchone()[0]
    assert sum(r["n_customers"] for r in rows) == n_cust
    for r in rows:
        code = r["rfm_code"]
        rs, fs, ms = code // 100, (code // 10) % 10, code % 10
        assert 1 <= rs <= 5 and 1 <= fs <= 5 and 1 <= ms <= 5
    # quintiles are balanced: each R score holds n/5 ± 1 customers
    per_r: dict[int, int] = {}
    for r in rows:
        per_r[r["rfm_code"] // 100] = (
            per_r.get(r["rfm_code"] // 100, 0) + r["n_customers"]
        )
    for s in range(1, 6):
        assert abs(per_r[s] - n_cust / 5) <= 1


# ---------------------------------------------------------------------------
# Geometry family
# ---------------------------------------------------------------------------


def test_jl_projection_replay_and_concentration(spark, duck):
    from fuzzy_item_matching_spark.queries.vectors import (
        _jl_params,
        vec_jl_projection,
    )

    rows = vec_jl_projection(spark, SF_CHECK).collect()
    emb = _pdf(
        duck,
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id",
    )
    vecs = {
        int(r.vec_id): np.asarray(list(r.embedding), dtype=float)
        for r in emb.itertuples()
        if r.embedding is not None and len(r.embedding) == 64
    }
    r_mat = np.asarray(_jl_params())
    ratios = []
    for vid, v in vecs.items():
        if vid % 2 != 0 or (vid + 1) not in vecs:
            continue
        w = vecs[vid + 1]
        d0 = float(np.sum((v - w) ** 2))
        if d0 <= 0:
            continue
        dp = float(np.sum((r_mat @ v - r_mat @ w) ** 2))
        ratios.append(dp / d0)
    got_pairs = sum(r["n_pairs"] for r in rows)
    assert got_pairs == len(ratios)
    wavg = sum(r["avg_ratio"] * r["n_pairs"] for r in rows) / got_pairs
    assert wavg == pytest.approx(float(np.mean(ratios)), abs=1e-6)
    # JL concentration: the mean distortion of an unbiased projection
    assert 0.8 < wavg < 1.2


def test_spherical_kmeans_unit_centroids_and_replay(spark, duck):
    from fuzzy_item_matching_spark.queries.vectors import (
        _SKM_ITERS,
        _SKM_K,
        vec_spherical_kmeans,
    )

    rows = vec_spherical_kmeans(spark, SF_CHECK).collect()
    cents: dict[int, dict[int, float]] = {}
    ns: dict[int, int] = {}
    for r in rows:
        cents.setdefault(r["c"], {})[r["j"]] = r["coord"]
        ns[r["c"]] = r["n"]
    # every centroid is unit-norm by construction
    for c, comp in cents.items():
        nrm = math.sqrt(sum(v * v for v in comp.values()))
        assert nrm == pytest.approx(1.0, abs=1e-9)
    # numpy replay of the full cosine-Lloyd chain
    emb = _pdf(duck, "SELECT vec_id, embedding FROM embeddings")
    pts = []
    for r in emb.itertuples():
        if r.embedding is None or len(r.embedding) != 64:
            continue
        v = np.asarray(list(r.embedding), dtype=float)
        if np.isnan(v).any() or float(np.sum(v * v)) <= 0:
            continue
        pts.append((int(r.vec_id), v / math.sqrt(float(np.sum(v * v)))))
    pts.sort(key=lambda t: t[0])
    x = np.stack([p[1] for p in pts])
    c_mat = x[: _SKM_K].copy()
    for _ in range(_SKM_ITERS):
        dots = x @ c_mat.T
        assign = np.argmax(dots, axis=1)  # ties → lowest index, as CASE
        new = []
        sizes = []
        for c in range(c_mat.shape[0]):
            sub = x[assign == c]
            if len(sub) == 0:
                continue
            mmean = sub.mean(axis=0)
            new.append(mmean / math.sqrt(float(np.sum(mmean * mmean))))
            sizes.append(len(sub))
        c_mat = np.stack(new)
    assert sorted(ns.values()) == sorted(sizes)
    got = np.stack(
        [
            np.asarray([cents[c][j] for j in sorted(cents[c])])
            for c in sorted(cents)
        ]
    )
    assert np.allclose(got, c_mat, atol=1e-6)


# ---------------------------------------------------------------------------
# Approximation evals (VERDICT r13 asks #3 and #6)
# ---------------------------------------------------------------------------


def test_probe_sensitivity_monotone_and_pin(spark):
    """Structural: a probe budget is a PREFIX of the margin ranking,
    so the candidate set grows with T, and any true top-k item that
    is a candidate necessarily ranks in the ANN top-k (it has one of
    the k best cosines globally) — recall must be non-decreasing in
    T. Pin: recall(T=13) >= the committed 0.713 (r13 headline)."""
    from fuzzy_item_matching_spark.queries.similarity import (
        sim_ann_probe_sensitivity,
    )

    rows = sorted(
        sim_ann_probe_sensitivity(spark, SF_CHECK).collect(),
        key=lambda r: r["probe_budget"],
    )
    recalls = [r["recall"] for r in rows]
    assert recalls == sorted(recalls)
    by_budget = {r["probe_budget"]: r["recall"] for r in rows}
    assert by_budget[13] >= 0.713


def test_adamic_adar_cap_contract(spark):
    """The measured fidelity contract of the adjacency cap (r14):
    at uniform sf0.01 density the production cap (32) yields ZERO
    top-50 set recall but keeps score effectiveness >= 0.5, and both
    metrics improve strictly with the cap — the cap is candidate
    generation, not ranking."""
    from fuzzy_item_matching_spark.queries.analytics import (
        rel_adamic_adar_recall,
    )

    rows = sorted(
        rel_adamic_adar_recall(spark, SF_CHECK).collect(),
        key=lambda r: r["adj_cap"],
    )
    assert [r["adj_cap"] for r in rows] == [32, 128]
    r32, r128 = rows
    assert r32["recall"] == 0.0
    assert 0.5 <= r32["effectiveness"] < r128["effectiveness"] <= 1.0
    assert r128["recall"] >= r32["recall"]
    for r in rows:
        assert 0.0 <= r["recall"] <= 1.0
        assert r["overlap"] <= r["k"]
