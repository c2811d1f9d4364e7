"""Property tests for the round-8 operators — invariants the exact
oracle equivalence (tests/test_all_oracles.py, driver) can't express:
EM/GD objective descent, metric monotonicity, probability sanity, and
planted-structure recovery.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from .conftest import SF_CHECK, SF_SMOKE


def test_fs_em_monotone_loglik(spark):
    """Each Fellegi-Sunter EM iteration must not decrease the observed
    -data log-likelihood Σ_γ n_γ · ln(λ·Πm + (1-λ)·Πu) — the EM
    guarantee, checked over the real pattern counts."""
    from fuzzy_item_matching_spark.queries.retrieval import (
        _FS_EM_INIT,
        serve_fs_em_fit,
    )
    from fuzzy_item_matching_spark.tables import load_table

    # rebuild the pattern counts the query's fit uses
    p = load_table(spark, SF_CHECK, "part").select(
        "p_partkey",
        "p_brand",
        "p_size",
        F.coalesce("p_type", F.lit("")).alias("f_type"),
        F.split(F.coalesce("p_name", F.lit("")), " ").getItem(0).alias("f1"),
        F.coalesce(
            F.split(F.coalesce("p_name", F.lit("")), " ").getItem(1),
            F.lit(""),
        ).alias("f2"),
    )
    a, b = p.alias("a"), p.alias("b")
    pat = (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .select(
            (F.col("a.f_type") == F.col("b.f_type")).cast("int").alias("g1"),
            (F.col("a.f1") == F.col("b.f1")).cast("int").alias("g2"),
            (F.col("a.f2") == F.col("b.f2")).cast("int").alias("g3"),
        )
        .groupBy("g1", "g2", "g3")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )

    def loglik(m, u, lam):
        ll = 0.0
        for r in pat:
            g = (r.g1, r.g2, r.g3)
            pm = lam
            pu = 1.0 - lam
            for j in range(3):
                pm *= m[j] if g[j] else 1.0 - m[j]
                pu *= u[j] if g[j] else 1.0 - u[j]
            ll += r.n * math.log(pm + pu)
        return ll

    def em_step(m, u, lam):
        sg = sng = sn = 0.0
        sgj = [0.0] * 3
        sngj = [0.0] * 3
        for r in pat:
            g = (r.g1, r.g2, r.g3)
            pm, pu = lam, 1.0 - lam
            for j in range(3):
                pm *= m[j] if g[j] else 1.0 - m[j]
                pu *= u[j] if g[j] else 1.0 - u[j]
            w = pm / (pm + pu)
            sg += r.n * w
            sng += r.n * (1 - w)
            sn += r.n
            for j in range(3):
                sgj[j] += r.n * w * g[j]
                sngj[j] += r.n * (1 - w) * g[j]
        return (
            [sgj[j] / sg for j in range(3)],
            [sngj[j] / sng for j in range(3)],
            sg / sn,
        )

    m = [_FS_EM_INIT[0]] * 3
    u = [_FS_EM_INIT[1]] * 3
    lam = _FS_EM_INIT[2]
    prev = loglik(m, u, lam)
    for _ in range(3):
        m, u, lam = em_step(m, u, lam)
        cur = loglik(m, u, lam)
        assert cur >= prev - 1e-9, (cur, prev)
        prev = cur

    # and the query's fitted parameters separate m > u on every field
    # (agreement is likelier under a match) with a sane prior
    rows = serve_fs_em_fit(spark, SF_CHECK).collect()
    assert len(rows) == 3
    for r in rows:
        assert 0.0 < r.lam < 1.0
        assert r.m > r.u, r


def test_platt_descends_logloss(spark):
    """Each Platt GD step must reduce the log loss of the calibrated
    probabilities on the training pairs."""
    from fuzzy_item_matching_spark.queries.training import (
        _gb_margin,
        _lr_pairs,
        train_platt_scaling,
    )

    traj = {
        r.iter: (r.a, r.b)
        for r in train_platt_scaling(spark, SF_CHECK).collect()
    }
    pairs = _lr_pairs(spark, SF_CHECK).select(
        F.col("label").cast("double").alias("y"),
        _gb_margin(spark, SF_CHECK).alias("s"),
    ).persist()

    def loss(a, b):
        p = 1.0 / (1.0 + F.exp(-(F.lit(a) * F.col("s") + F.lit(b))))
        [r] = pairs.agg(
            F.avg(
                -(
                    F.col("y") * F.log(p)
                    + (1.0 - F.col("y")) * F.log(1.0 - p)
                )
            ).alias("l")
        ).collect()
        return r.l

    prev = loss(1.0, 0.0)
    for t in sorted(traj):
        cur = loss(*traj[t])
        assert cur <= prev + 1e-12, (t, cur, prev)
        prev = cur
    pairs.unpersist()


def test_pr_curve_monotone_recall(spark):
    """Raising the threshold can only shrink the predicted-positive
    set: recall is non-increasing in τ, and tp+fn is the constant
    positive count."""
    from fuzzy_item_matching_spark.queries.training import train_pr_curve

    rows = sorted(
        train_pr_curve(spark, SF_CHECK).collect(), key=lambda r: r.thr
    )
    assert len(rows) == 19
    npos = {r.tp + r.fn for r in rows}
    assert len(npos) == 1
    for lo, hi in zip(rows, rows[1:]):
        assert hi.recall <= lo.recall + 1e-12
        assert hi.tp <= lo.tp and hi.fp <= lo.fp


def test_kneser_ney_proper_distribution(spark):
    """For every head with kept mass, the interpolated KN probability
    summed over ALL kept continuations plus the backoff mass assigned
    to the rest stays ≤ 1 + ε (discounting redistributes, never
    inflates); per-doc NLL is positive."""
    from fuzzy_item_matching_spark.queries.textstats import (
        _KN_D,
        ts_kneser_ney,
    )
    from fuzzy_item_matching_spark.functions.text import regex_tokenize
    from fuzzy_item_matching_spark.tables import load_table

    out = ts_kneser_ney(spark, SF_SMOKE).collect()
    assert out and all(r.nll > 0 for r in out)

    d = load_table(spark, SF_SMOKE, "documents")
    tok = d.select("doc_id", regex_tokenize("text").alias("t")).filter(
        F.size("t") >= 2
    )
    pr = tok.select(
        F.posexplode(F.slice("t", 1, F.size("t") - 1)).alias("i", "w1"),
        "t",
    ).select("w1", F.expr("t[i + 1]").alias("w2"))
    model = {
        (r.w1, r.w2): r.c
        for r in pr.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 2)
        .collect()
    }
    n_bi = len(model)
    c1, n1p, cont = {}, {}, {}
    for (w1, w2), c in model.items():
        c1[w1] = c1.get(w1, 0) + c
        n1p[w1] = n1p.get(w1, 0) + 1
        cont[w2] = cont.get(w2, 0) + 1
    pc = {w2: n / n_bi for w2, n in cont.items()}
    for w1 in list(c1)[:50]:
        # kept continuations at full formula + ALL unseen continuations
        # at the backoff term (c = 0): total = Σ_kept + Σ_unseen
        kept = sum(
            (max(model[(a, b)] - _KN_D, 0.0) + _KN_D * n1p[w1] * pc[b])
            / c1[w1]
            for (a, b) in model
            if a == w1
        )
        unseen = sum(
            _KN_D * n1p[w1] * p / c1[w1]
            for b, p in pc.items()
            if (w1, b) not in model
        )
        assert kept + unseen <= 1.0 + 1e-9, (w1, kept, unseen)


def test_substring_spans_planted_duplicate(spark):
    """Two documents sharing a long verbatim run must both emit a span
    covering that run; a unique document emits none."""
    from fuzzy_item_matching_spark.queries import REGISTRY
    import fuzzy_item_matching_spark.queries.dedup as dd

    shared = " ".join(f"tok{i}" for i in range(12))
    rows = [
        (1, f"aaa bbb {shared} ccc"),
        (2, f"{shared} zzz yyy xxx www vvv uuu ttt sss"),
        (3, " ".join(f"uniq{i}" for i in range(20))),
    ]
    import tempfile, os
    import pandas as pd

    with tempfile.TemporaryDirectory() as td:
        pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
        pdf["lang"] = "en"
        pdf["source"] = "s"
        pdf["n_chars"] = pdf.text.str.len()
        pdf.to_parquet(os.path.join(td, "documents.parquet"))
        got = dd.dedup_substring_spans(spark, td).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 3 not in by_doc
    # doc 1: shared run occupies token positions 3..14 (1-based)
    [s1] = by_doc[1]
    assert (s1.span_start, s1.span_end) == (3, 14)
    [s2] = by_doc[2]
    assert (s2.span_start, s2.span_end) == (1, 12)


def test_dsir_separates_target_language(spark):
    """Mean DSIR log-weight of target-language docs must exceed the
    non-target mean — the importance weights carry the signal the
    resampler selects on."""
    from fuzzy_item_matching_spark.queries.textstats import (
        _DSIR_TGT,
        ts_dsir_weights,
    )
    from fuzzy_item_matching_spark.tables import load_table

    w = ts_dsir_weights(spark, SF_CHECK)
    langs = load_table(spark, SF_CHECK, "documents").select(
        "doc_id", "lang"
    )
    rows = w.join(langs, "doc_id").groupBy(
        (F.col("lang") == _DSIR_TGT).alias("is_tgt")
    ).agg(F.avg("log_weight").alias("mw")).collect()
    means = {r.is_tgt: r.mw for r in rows}
    assert means[True] > means[False], means


def test_unigram_em_improves_likelihood(spark):
    """The EM iteration must not decrease the corpus log-likelihood
    Σ_w wc·ln Z_w, and both p0 and p1 must be proper distributions
    (sum ≈ 1 over the vocabulary)."""
    from fuzzy_item_matching_spark.functions.text import regex_tokenize
    from fuzzy_item_matching_spark.operators.unigram_lm import (
        KMAX,
        MAXLEN,
        unigram_em_fit,
    )
    from fuzzy_item_matching_spark.tables import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    out = unigram_em_fit(d, regex_tokenize("text")).collect()
    s0 = sum(r.p0 for r in out)
    s1 = sum(r.p1 for r in out)
    assert abs(s0 - 1.0) < 1e-6, s0
    assert abs(s1 - 1.0) < 1e-6, s1

    # replicate the DP in python and compare corpus log-likelihood
    import math

    words = {}
    for r in (
        d.select(F.explode(regex_tokenize("text")).alias("w")).collect()
    ):
        w = r.w[:MAXLEN]
        words[w] = words.get(w, 0) + 1

    def loglik(p):
        ll = 0.0
        for w, wc in words.items():
            a = [0.0] * (len(w) + 1)
            a[0] = 1.0
            for i in range(1, len(w) + 1):
                for k in range(1, min(KMAX, i) + 1):
                    a[i] += a[i - k] * p.get(w[i - k : i], 0.0)
            assert a[len(w)] > 0, w
            ll += wc * math.log(a[len(w)])
        return ll

    p0 = {r.piece: r.p0 for r in out}
    p1 = {r.piece: r.p1 for r in out}
    assert loglik(p1) >= loglik(p0) - 1e-9


def test_unigram_viterbi_segmentation_valid_and_optimal(spark):
    """Viterbi output: pieces reassemble the word, best_p equals the
    product of piece probabilities, and no exhaustive segmentation
    beats it."""
    import itertools

    from fuzzy_item_matching_spark.functions.text import regex_tokenize
    from fuzzy_item_matching_spark.operators.unigram_lm import (
        KMAX,
        unigram_em_fit,
        unigram_viterbi_segments,
    )
    from fuzzy_item_matching_spark.tables import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    segs = unigram_viterbi_segments(d, regex_tokenize("text")).collect()
    p0 = {
        r.piece: r.p0
        for r in unigram_em_fit(d, regex_tokenize("text")).collect()
    }

    def all_segmentations(w):
        if not w:
            yield []
            return
        for k in range(1, min(KMAX, len(w)) + 1):
            head = w[:k]
            for rest in all_segmentations(w[k:]):
                yield [head] + rest

    assert segs
    for r in segs:
        pieces = r.seg.split(" ")
        assert "".join(pieces) == r.w
        assert r.n_pieces == len(pieces)
        # p0 from the fit OUTPUT is rounded to 9 decimals while the
        # operator's internal map is unrounded — compare logs at the
        # absolute tolerance that rounding implies (~1e-5).
        import math

        lp = sum(math.log(p0.get(q, 0.0)) for q in pieces)
        assert abs(lp - r.best_lp) <= 1e-5, (r.w, lp, r.best_lp)
        best = max(
            (
                math.prod(p0.get(q, 0.0) for q in s)
                for s in all_segmentations(r.w)
            ),
        )
        assert r.best_lp >= math.log(best) - 1e-5, (r.w, r.best_lp, best)


def test_scene_cuts_planted_transition(spark):
    """A document whose bytes flip from 'a'*64 to 'z'*64 must split
    into exactly two scenes at the frame boundary; a constant payload
    stays one scene."""
    import os
    import tempfile

    import pandas as pd

    import fuzzy_item_matching_spark.queries.multimodal as mm

    rows = [(1, "a" * 64 + "z" * 64), (2, "b" * 128)]
    with tempfile.TemporaryDirectory() as td:
        pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
        pdf["lang"] = "en"
        pdf["source"] = "s"
        pdf["n_chars"] = pdf.text.str.len()
        pdf.to_parquet(os.path.join(td, "documents.parquet"))
        got = mm.mm_scene_cuts(spark, td).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    s1 = sorted(by_doc[1], key=lambda r: r.start_frame)
    # 'a'=97, 'z'=122: frame sigs 97*32 vs 122*32 -> |diff| = 800 > 96
    assert len(s1) == 2 and s1[0].start_frame == 0
    assert s1[1].start_frame == 2  # 64 chars = 2 frames of 32
    assert len(by_doc[2]) == 1 and by_doc[2][0].n_frames == 4


def test_gboost_early_stop_flags_min(spark):
    """Exactly one best round; it attains the minimum validation
    loss; more boosting rounds never increase TRAIN fit but can
    overfit val — the flag must track val, not round count."""
    from fuzzy_item_matching_spark.queries.training import (
        train_gboost_early_stop,
    )

    rows = sorted(
        train_gboost_early_stop(spark, SF_CHECK).collect(),
        key=lambda r: r.round,
    )
    assert len(rows) == 5
    best = [r for r in rows if r.is_best == 1]
    assert len(best) == 1
    mn = min(r.val_loss for r in rows)
    assert best[0].val_loss == mn
    # and it's the EARLIEST attaining round
    first_min = next(r.round for r in rows if r.val_loss == mn)
    assert best[0].round == first_min
