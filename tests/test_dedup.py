"""Dedup correctness beyond the oracle: containment, recall, properties.

The sf0.01 documents corpus has 25 planted near-dup pairs at
jaccard ≥ 0.8 with background pairs < 0.2 — a clean separation the
approximate variants are graded against.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fuzzy_item_matching_spark.functions.text import regex_tokenize
from fuzzy_item_matching_spark.operators.dedup import (
    minhash_lsh_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash_bits,
    simhash_pairs,
    word_shingles,
)
from fuzzy_item_matching_spark.tables import load_table

from .conftest import SF_CHECK


@pytest.fixture(scope="module")
def documents(spark):
    return load_table(spark, SF_CHECK, "documents").cache()


@pytest.fixture(scope="module")
def jaccard_pairs(documents):
    return {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(
            documents, "doc_id", regex_tokenize("text"), n=3, min_jaccard=0.5
        ).collect()
    }


def test_minhash_subset_and_recall(documents, jaccard_pairs):
    mh = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            documents, "doc_id", regex_tokenize("text"),
            n=3, n_hashes=32, bands=8, min_jaccard=0.5, seed=42,
        ).collect()
    }
    assert mh <= jaccard_pairs, f"minhash emitted {len(mh - jaccard_pairs)} false pairs"
    # b=8, r=4: P[candidate | j=0.8] = 1-(1-0.8^4)^8 ≈ 0.985; planted
    # dups sit at j≥0.8, so near-total recall is expected.
    assert len(mh) / len(jaccard_pairs) >= 0.9


def test_minhash_signature_similarity_tracks_jaccard(spark):
    # Identical shingle sets -> identical signatures.
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "the quick brown fox jumps over the lazy dog")],
        ["id", "text"],
    ).select("id", minhash_signature(word_shingles(regex_tokenize("text"), 3), 16).alias("sig"))
    a, b = [r.sig for r in df.collect()]
    assert a == b


def test_simhash_identical_and_disjoint(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),
         (3, "one two three four five six seven eight")],
        ["id", "text"],
    ).select("id", simhash_bits(regex_tokenize("text")).alias("bits"))
    rows = {r.id: r.bits for r in df.collect()}
    assert rows[1] == rows[2]
    assert len(rows[1]) == 64 and set(rows[1]) <= {"0", "1"}
    hamming_13 = sum(x != y for x, y in zip(rows[1], rows[3]))
    assert hamming_13 > 10, "disjoint token sets should differ in many bits"


def test_simhash_zero_token_docs_join_no_pairs(spark):
    """Documented zero-token semantics (both hash paths): empty docs
    emit no fingerprint and so no pairs — NOT one degenerate all-zero
    bucket where every empty doc matches every other at hamming 0."""
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"),
         (2, "alpha beta gamma delta"),
         (3, ""),
         (4, "   ")],
        ["id", "text"],
    )
    for portable in (False, True):
        pairs = {
            (r.id_a, r.id_b)
            for r in simhash_pairs(
                df, "id", regex_tokenize("text"),
                max_hamming=3, band_bits=16, portable=portable,
            ).collect()
        }
        assert pairs == {(1, 2)}, f"portable={portable}: {pairs}"


def test_simhash_pairs_track_planted_dups(documents, jaccard_pairs):
    sh = {
        (r.id_a, r.id_b)
        for r in simhash_pairs(
            documents, "doc_id", regex_tokenize("text"), max_hamming=3, band_bits=16
        ).collect()
    }
    assert sh, "expected simhash to find the planted near-dups"
    # SimHash measures weighted-bag cosine, not shingle Jaccard — most
    # but not necessarily all planted pairs appear, few extras.
    assert len(sh & jaccard_pairs) / len(jaccard_pairs) >= 0.5
    assert len(sh - jaccard_pairs) <= len(sh) // 2


def test_jaccard_pair_values_bounded(documents):
    rows = ngram_jaccard_pairs(
        documents, "doc_id", regex_tokenize("text"), n=3, min_jaccard=0.5
    ).collect()
    assert rows
    for r in rows:
        assert 0.5 <= r.jaccard <= 1.0
        assert r.id_a < r.id_b


def test_connected_components_closes_chains(spark):
    from fuzzy_item_matching_spark.operators.dedup import connected_components

    # chain 1-2-3-4 (diameter 3, needs >1 propagation round), separate
    # pair 10-11, isolated node 99 absent from the edge list entirely
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    comp = {
        r.node: r.component for r in connected_components(edges).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_vs_one_hop(spark):
    from fuzzy_item_matching_spark.operators.dedup import connected_components

    # one-hop min-id leaves 4 pointing at 3 (its only earlier match);
    # the closure must pull the whole chain to 1
    edges = spark.createDataFrame([(1, 2), (3, 4), (2, 3)], ["id_a", "id_b"])
    comp = {
        r.node: r.component for r in connected_components(edges).collect()
    }
    assert comp[4] == 1


def test_semantic_pairs_subset_and_recall(spark):
    """ivf_cell_pairs emits a SUBSET of the exact >= t cosine pairs
    (every within-probed-cell pair is scored with the exact fold-order
    cosine) with a pinned recall floor on the weakly-clustered test
    embeddings (n_probe=2 finds 40/59 at sf0.01)."""
    from fuzzy_item_matching_spark.functions.vector import cosine_similarity
    from fuzzy_item_matching_spark.operators.ivf import ivf_cell_pairs

    e = load_table(spark, SF_CHECK, "embeddings")
    sem = {
        (r.id_a, r.id_b): r.cosine
        for r in ivf_cell_pairs(
            e, "vec_id", "embedding", min_cosine=0.4, n_centroids=16,
            n_probe=2, refine_iters=1,
        ).collect()
    }
    a, b = e.alias("a"), e.alias("b")
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cosine_similarity(F.col("a.embedding"), F.col("b.embedding")).alias(
                "cosine"
            ),
        )
        .filter(F.col("cosine") >= 0.4)
        .collect()
    }
    assert set(sem) <= set(exact)
    for k, v in sem.items():  # same pair -> bitwise-identical cosine
        assert v == exact[k]
    assert len(sem) / len(exact) >= 0.6


def test_semantic_keep_drops_exactly_pair_targets(spark):
    """kept=0 iff the vector is some pair's id_b (min-id survivorship):
    the keep verdict is a pure function of the pair frame."""
    from fuzzy_item_matching_spark.queries import load_all

    reg = load_all()
    pairs = reg["dedup_semantic_pairs"].fn(spark, SF_CHECK).collect()
    keep = reg["dedup_semantic_keep"].fn(spark, SF_CHECK).collect()
    dropped = {r.id_b for r in pairs}
    assert {r.vec_id for r in keep if r.kept == 0} == dropped
    n = load_table(spark, SF_CHECK, "embeddings").count()
    assert len(keep) == n


def test_incremental_minhash_equals_full_restricted(spark):
    """Incremental mode == the full run restricted to pairs touching
    the delta (same bands, same Jaccard verify — only the probe side
    shrinks), with identical jaccard values."""
    from fuzzy_item_matching_spark.queries import load_all

    reg = load_all()
    full = {
        (r.id_a, r.id_b): r.jaccard
        for r in reg["dedup_minhash_lsh"].fn(spark, SF_CHECK).collect()
    }
    incr = {
        (r.id_a, r.id_b): r.jaccard
        for r in reg["dedup_incremental_minhash"].fn(spark, SF_CHECK).collect()
    }
    expected = {
        k: v for k, v in full.items() if k[0] % 5 == 0 or k[1] % 5 == 0
    }
    assert incr == expected
    assert incr  # the delta actually touches planted pairs


def test_cdc_resynchronizes_after_insertion(spark):
    """The CDC selling point, pinned: insert a run of tokens mid-doc
    and the chunk fingerprints AFTER the insertion re-synchronize at
    the next boundary token, so shared passages are still found —
    while an 8-token fixed grid (dedup_chunk_lines' discipline)
    misaligns every downstream chunk (6 % 8 != 0) and the shared
    suffix fingerprints as all-new content."""
    from fuzzy_item_matching_spark.operators.dedup import cdc_chunk_ledger

    # 'jasper' (suffix) and 'juliet'/'sierra' (prefix) are boundary
    # tokens under md5 % 16 — verified constants, so the suffix is
    # guaranteed to re-synchronize at 'jasper'.
    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray yankee zulu amber birch cedar dune "
        "ember fjord grove heath iris jade jasper lagoon mesa nectar "
        "ocean prairie quarry ridge slate tundra vale willow xenon yarrow"
    ).split()
    inserted = "one two three four five six".split()
    cut = 24
    variant = base[:cut] + inserted + base[cut:]
    df = spark.createDataFrame(
        [(1, " ".join(base)), (2, " ".join(variant))], "doc_id long, text string"
    )
    shared = cdc_chunk_ledger(
        df, "doc_id", regex_tokenize("text"), mod=16, min_toks=3
    ).collect()
    assert shared, "CDC found no shared chunks across the revision pair"

    # At least one shared chunk must live strictly AFTER the insertion
    # point (re-synchronization, not just the untouched prefix). The
    # ledger returns hashes; recompute which side of the cut each
    # shared chunk could have come from by membership in the suffix.
    suffix = set(base[cut:])
    prefix = set(base[:cut])
    # re-derive chunk texts: group the ledger back to texts via a
    # second run without hashing — simplest is to recompute chunks per
    # doc with the same boundary rule in python
    import hashlib

    def chunks_of(toks):
        out, cur = [], []
        for t in toks:
            boundary = (
                int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 16 == 0
            )
            if boundary and cur:
                out.append(cur)
                cur = []
            cur.append(t)
        if cur:
            out.append(cur)
        return [" ".join(c) for c in out if len(c) >= 3]

    base_chunks = set(chunks_of(base))
    var_chunks = set(chunks_of(variant))
    shared_py = base_chunks & var_chunks
    # Spark ledger and the python reference agree on the shared set
    hashes_spark = {r["chunk_hash"] for r in shared}
    hashes_py = {
        hashlib.md5(c.encode()).hexdigest() for c in shared_py
    }
    assert hashes_spark == hashes_py
    # and re-synchronization happened: a shared chunk made only of
    # suffix (post-insertion) tokens exists
    assert any(
        set(c.split()) <= suffix and not set(c.split()) <= prefix
        for c in shared_py
    ), "no shared chunk after the insertion point — CDC failed to resync"

    # The fixed 8-token grid does NOT share any post-insertion chunk:
    def grid_chunks(toks, w=8):
        return {
            " ".join(toks[i : i + w]) for i in range(0, len(toks), w)
        }

    grid_shared = grid_chunks(base) & grid_chunks(variant)
    assert not any(
        set(c.split()) <= suffix and not set(c.split()) <= prefix
        for c in grid_shared
    ), "fixture degenerate: grid chunking also resynced (insertion % 8 == 0?)"
