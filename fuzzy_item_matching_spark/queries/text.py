"""Text featurization queries (SURVEY §2.G) over `documents` and `part`.

Each query pairs an array-native Spark plan with an exact DuckDB
oracle. Array outputs are rendered with a '|' join so the compared
cell is a plain string (engine-neutral, hash-stable).

Tokenization semantics are the reference's RegexTokenizer
(`01_Feature Engineering.py:184-193`): lowercase, split on [^\\w\\d],
drop empty tokens — identical regex class in Java and RE2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fuzzy_item_matching_spark.functions.text import (
    ENGLISH_STOPWORDS,
    char_ngrams_of_words,
    md5_bucket,
    regex_tokenize,
    remove_stopwords,
    word_ngrams,
)
from fuzzy_item_matching_spark.queries import query
from fuzzy_item_matching_spark.tables import load_table

# DuckDB mirror of regex_tokenize(col): same regex, same empty-filter.
# coalesce mirrors regex_tokenize's null normalization (reference
# `01_Feature Engineering.py:147,155`): null text -> empty token list.
_D_TOKENS = (
    "list_filter(regexp_split_to_array(lower(coalesce({c}, '')), '[^\\w\\d]'),"
    " x -> length(x) >= 1)"
)
# The identical 181-word list, SQL-quoted (apostrophes doubled).
_D_STOPWORDS = "[" + ", ".join(
    "'" + w.replace("'", "''") + "'" for w in ENGLISH_STOPWORDS
) + "]"


@query(
    "text_tokens",
    oracle=f"""
    SELECT doc_id,
           array_to_string({_D_TOKENS.format(c="text")}, '|') AS tokens_str,
           len({_D_TOKENS.format(c="text")}) AS n_tokens
    FROM documents
    """,
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1 RegexTokenizer over documents.text — pure narrow projection,
    whole-stage codegen, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    toks = regex_tokenize("text")
    return d.select(
        "doc_id",
        F.concat_ws("|", toks).alias("tokens_str"),
        F.size(toks).alias("n_tokens"),
    )


@query(
    "text_stop_filtered",
    oracle=f"""
    SELECT doc_id,
           array_to_string(
             list_filter({_D_TOKENS.format(c="text")},
                         t -> NOT list_contains({_D_STOPWORDS}, t)), '|') AS kept_str,
           len({_D_TOKENS.format(c="text")})
             - len(list_filter({_D_TOKENS.format(c="text")},
                               t -> NOT list_contains({_D_STOPWORDS}, t))) AS n_stopwords
    FROM documents
    """,
)
def text_stop_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 StopWordsRemover parity with Spark's full 181-word English
    list (`01_Feature Engineering.py:195-201`); bag semantics preserved
    (filter, not array_except — the latter dedups)."""
    d = load_table(spark, sf_dir, "documents")
    # Bind tokens, then the filtered bag, in separate projections —
    # `kept` is referenced twice below; unbound it would run the
    # 181-word filter (and the tokenizer under it) twice per row.
    return (
        d.select("doc_id", regex_tokenize("text").alias("__toks"))
        .select(
            "doc_id",
            F.size("__toks").alias("__n"),
            remove_stopwords(F.col("__toks")).alias("__kept"),
        )
        .select(
            "doc_id",
            F.concat_ws("|", "__kept").alias("kept_str"),
            (F.col("__n") - F.size("__kept")).alias("n_stopwords"),
        )
    )


@query(
    "text_char_3grams",
    oracle=f"""
    SELECT p_partkey,
           array_to_string(
             flatten(list_transform({_D_TOKENS.format(c="p_name")},
               w -> list_transform(generate_series(1, greatest(length(w)-2, 0)),
                                   i -> w[i:i+2]))), '|') AS grams_str
    FROM part
    """,
)
def text_char_3grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3+T4+T5 composite: per-word char-3-grams of part.p_name,
    flattened to one bag per row (`01_Feature Engineering.py:203-249`).
    The reference does melt→NGram→explode→collect_list (two shuffles);
    nested transform+flatten is row-local — zero shuffles at any SF."""
    p = load_table(spark, sf_dir, "part")
    grams = char_ngrams_of_words(regex_tokenize("p_name"), n=3)
    return p.select("p_partkey", F.concat_ws("|", grams).alias("grams_str"))


@query(
    "text_word_2grams",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_D_TOKENS.format(c="text")} AS toks FROM documents)
    SELECT doc_id,
           array_to_string(
             list_transform(generate_series(1, greatest(len(toks)-1, 0)),
                            i -> toks[i] || ' ' || toks[i+1]), '|') AS bigrams_str
    FROM t
    """,
)
def text_word_2grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6 word-2-gram (ml.feature.NGram(n=2) semantics,
    `01_Feature Engineering.py:342-349`) — space-joined adjacent
    tokens, row-local."""
    d = load_table(spark, sf_dir, "documents")
    # Tokens bound in a prior projection: referenced from inside
    # word_ngrams' transform lambda, an unbound tokenizer expression
    # would re-run per output gram (O(L²) per doc, measured 8-30s at
    # sf0.1 vs ~1s bound).
    return d.select("doc_id", regex_tokenize("text").alias("__toks")).select(
        "doc_id",
        F.concat_ws("|", word_ngrams(F.col("__toks"), n=2)).alias("bigrams_str"),
    )


@query(
    "text_hashed_tf",
    oracle=f"""
    SELECT doc_id,
           CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) % 1024 AS bucket,
           COUNT(*) AS tf
    FROM (SELECT doc_id, unnest({_D_TOKENS.format(c="text")}) AS t FROM documents)
    GROUP BY doc_id, bucket
    """,
)
def text_hashed_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7 HashingTF in sparse relational layout: (doc, bucket, tf)
    rows (`01_Feature Engineering.py:274-282`). Uses the md5 bucket
    (portable across engines — exact oracle); the Murmur3 variant
    (`functions.text.hashed_tf`) is the hot path and is
    property-checked in tests/ (hash parity is not the contract,
    SURVEY §7.2 stage 4). One shuffle: the (doc,bucket) hash agg."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(regex_tokenize("text")).alias("t"))
        .groupBy("doc_id", md5_bucket("t", 1024).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("tf"))
    )


@query(
    "text_levenshtein_pairs",
    oracle="""
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           levenshtein(a.p_name, b.p_name) AS edit_dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_size = b.p_size
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 12
    """,
)
def text_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy pairs — the third similarity family next to
    Jaccard (dedup) and cosine (similarity). Levenshtein is O(len²)
    per pair with no sub-linear index, so it NEEDS a blocking key:
    here (brand, size) bounds the candidate set exactly like the
    reference bounds LSH candidates with thresholds
    (`02_Build Training Pairs.py:119-123`). Both engines implement the
    standard DP edit distance → exact integer oracle."""
    p = load_table(spark, sf_dir, "part")
    a = p.alias("a")
    b = p.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .select(
            F.col("a.p_partkey").alias("id_a"),
            F.col("b.p_partkey").alias("id_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= 12)
    )


# Fixed BPE merge table (rank order matters: later merges consume the
# symbols earlier merges produced, e.g. 'jo'+'in' needs 'in' first).
# Production ships a learned table as a model artifact exactly like
# this — the apply step, not the fit, is the 100 TB operation.
_BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("i n", "in"),
    ("e r", "er"),
    ("a n", "an"),
    ("s t", "st"),
    ("r o", "ro"),
    ("ro w", "row"),
    ("t h", "th"),
    ("th e", "the"),
    ("v a", "va"),
    ("va l", "val"),
    ("val u", "valu"),
    ("valu e", "value"),
    ("k e", "ke"),
    ("ke y", "key"),
    ("j o", "jo"),
    ("jo in", "join"),
    ("a t", "at"),
    ("o r", "or"),
)


# Passes per merge rule: a single non-overlapping replace of ' a b '
# consumes the shared boundary space, skipping every second merge in a
# chain like [a,b,a,b,a]; P passes resolve chains up to 2^P symbols,
# reproducing the standard left-to-right greedy scan for any realistic
# word length. Both engines (and the test replica) run the identical
# pass count, so parity is exact by construction.
_BPE_PASSES = 3


def _bpe_sql(word_expr: str) -> str:
    """DuckDB expression applying the merge table to one word: chars
    spaced out, then the ranked replaces — space-padded so a pair only
    matches at SYMBOL boundaries (plain substring replace would corrupt
    an adjacent multi-char symbol: pair (a,n) must not split 'va n')."""
    s = f"' ' || trim(regexp_replace({word_expr}, '(.)', '\\1 ', 'g')) || ' '"
    for a, b in _BPE_MERGES:
        for _ in range(_BPE_PASSES):
            s = f"replace({s}, ' {a} ', ' {b} ')"
    return f"trim({s})"


@query(
    "text_bpe_segments",
    oracle=f"""
    WITH words AS (
      SELECT unnest({_D_TOKENS.format(c="text")}) AS w FROM documents
    ),
    seg AS (
      SELECT unnest(string_split({_bpe_sql("w")}, ' ')) AS segment
      FROM words
    )
    SELECT segment, COUNT(*) AS n FROM seg GROUP BY segment
    """,
)
def text_bpe_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLY: segment every corpus word with a fixed
    ranked merge table (greedy non-overlapping replaces, standard BPE
    encode semantics) and return the resulting segment vocabulary with
    counts — the subword-tokenization pass an LLM data pipeline runs
    over the full corpus. The merge table is a plan literal, the exact
    shape of shipping a learned tokenizer model to every executor; the
    fit (pair-counting iterations) would be the same hash aggs run ~30k
    times driver-side, amortized once per tokenizer, not per corpus.

    Plan: pure narrow string expressions (regexp char-split + chained
    replaces, whole-stage codegen, no UDF) feeding one explode and one
    hash agg on a vocabulary-bounded key space — map-side combine does
    almost all the work. 100 TB: embarrassingly parallel scan;
    the only shuffle carries ≤|vocab| combined rows per task.

    Determinism: replace() is left-to-right non-overlapping in both
    engines; counts are exact integers.
    """
    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(regex_tokenize("text")).alias("w"))
    s = F.concat(
        F.lit(" "), F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 ")), F.lit(" ")
    )
    for a, b in _BPE_MERGES:
        for _ in range(_BPE_PASSES):
            s = F.replace(s, F.lit(f" {a} "), F.lit(f" {b} "))
    s = F.trim(s)
    return (
        words.select(F.explode(F.split(s, " ")).alias("segment"))
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_BPE_FIT_ITERS = 8


def _bpe_fit_oracle() -> str:
    """Generate the unrolled-iteration DuckDB twin of the BPE fit:
    each level recomputes boundary pairs over the current segmentation,
    picks the argmax (count DESC, pair ASC), and applies it via the
    same padded {p}-pass replace — the merge arriving through a one-row
    cross join instead of a driver collect (same unrolled-loop oracle
    technique as the IVF Lloyd refinement, queries/similarity.py)."""
    parts = [
        """
    WITH v0 AS (
      SELECT w, COUNT(*) AS wc FROM (
        SELECT unnest({toks}) AS w FROM documents
      ) GROUP BY w
    ),
    seg0 AS (
      SELECT w, wc,
             ' ' || trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' ' AS s
      FROM v0
    )""".format(toks=_D_TOKENS.format(c="text"))
    ]
    for k in range(1, _BPE_FIT_ITERS + 1):
        apply_s = "s"
        for _ in range(_BPE_PASSES):
            apply_s = (
                f"replace({apply_s}, ' ' || b.p || ' ',"
                f" ' ' || replace(b.p, ' ', '') || ' ')"
            )
        parts.append(f"""
    pairs{k} AS (
      SELECT p, SUM(wc) AS cnt FROM (
        SELECT wc,
               unnest(list_transform(generate_series(1, len(a) - 1),
                      i -> a[i] || ' ' || a[i + 1])) AS p
        FROM (SELECT wc, string_split(trim(s), ' ') AS a FROM seg{k - 1})
      ) GROUP BY p
    ),
    best{k} AS (
      SELECT CAST({k} AS INT) AS rank, p, CAST(cnt AS BIGINT) AS cnt
      FROM pairs{k} ORDER BY cnt DESC, p ASC LIMIT 1
    ),
    seg{k} AS (
      SELECT w, wc, {apply_s} AS s FROM seg{k - 1}, best{k} b
    )""")
    union = " UNION ALL ".join(
        f"SELECT * FROM best{k}" for k in range(1, _BPE_FIT_ITERS + 1)
    )
    parts.append(f"""
    SELECT rank, p AS pair, replace(p, ' ', '') AS merged, cnt
    FROM ({union})""")
    return ",".join(parts[:1]) + "," + ",".join(parts[1:-1]) + parts[-1]


@query("text_bpe_fit", oracle=_bpe_fit_oracle())
def text_bpe_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer FIT: learn the first {n} merge rules from the
    corpus word vocabulary — the iterative half of subword
    tokenization (text_bpe_segments is the apply half). Each iteration
    counts adjacent symbol pairs weighted by word frequency, picks the
    most frequent (pair-ASC tie-break), and merges it everywhere.

    Plan: the iteration state lives in ONE distributed frame (distinct
    words × running segmentation — vocabulary-sized, orders of
    magnitude smaller than the corpus; the corpus is touched exactly
    once by the initial word count). Per iteration: an explode over
    boundary pairs + a map-side-combinable SUM, then a driver collect
    of a SINGLE argmax row (the same KB-scale collect budget as the
    IVF centroid loop, operators/ivf.py) folded back into the plan as
    a replace literal. At 100 TB the vocab frame is ~10⁷ rows — the
    loop cost is {n} cheap aggs, independent of corpus size.

    Determinism: counts are exact integers; argmax tie-breaks on the
    pair string; the oracle unrolls all {n} iterations as CTE levels
    computing the identical argmax through a one-row cross join.
    """
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(regex_tokenize("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    seg = words.select(
        "w",
        "wc",
        F.concat(
            F.lit(" "),
            F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 ")),
            F.lit(" "),
        ).alias("s"),
    )
    merges: list[tuple[int, str, str, int]] = []
    for k in range(1, _BPE_FIT_ITERS + 1):
        seg = seg.persist()
        # sequence(1, n) steps DOWN when n < 1 in Spark (yielding bad
        # element_at indices), so single-symbol words are filtered out
        # up front — DuckDB's generate_series just returns [] for them.
        # split(trim(s)) is bound ONCE before the lambda: inlined, Spark
        # re-splits the segment string per adjacent pair (O(W²) per
        # word — the ts_charlm_score recompute class).
        pairs = (
            seg.select(
                "wc", F.split(F.trim(F.col("s")), " ").alias("__sy")
            )
            .filter(F.size("__sy") >= 2)
            .select(
                "wc",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(__sy) - 1),"
                        " i -> concat(element_at(__sy, i), ' ',"
                        " element_at(__sy, i + 1)))"
                    )
                ).alias("p"),
            )
            .groupBy("p")
            .agg(F.sum("wc").alias("cnt"))
        )
        [best] = pairs.orderBy(F.desc("cnt"), F.asc("p")).limit(1).collect()
        merged = best["p"].replace(" ", "")
        merges.append((k, best["p"], merged, best["cnt"]))
        s = F.col("s")
        for _ in range(_BPE_PASSES):
            s = F.replace(
                s, F.lit(f" {best['p']} "), F.lit(f" {merged} ")
            )
        nxt = seg.withColumn("s", s)
        nxt = nxt.localCheckpoint(eager=True)
        seg.unpersist()
        seg = nxt
    return spark.createDataFrame(
        merges, "rank int, pair string, merged string, cnt long"
    )


text_bpe_fit.__doc__ = text_bpe_fit.__doc__.format(n=_BPE_FIT_ITERS)


@query(
    "text_jaro_winkler_pairs",
    oracle="""
    SELECT id_a, id_b, jw FROM (
      SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
             jaro_winkler_similarity(a.p_name, b.p_name) AS jw
      FROM part a JOIN part b
        ON a.p_brand = b.p_brand AND a.p_size = b.p_size
       AND a.p_partkey < b.p_partkey
    ) WHERE jw >= 0.88
    """,
)
def text_jaro_winkler_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaro-Winkler fuzzy pairs — the record-linkage scoring kernel
    (Winkler 1990, the string comparator behind Fellegi-Sunter
    deployments) next to Levenshtein (edit family), Jaccard (set
    family), and cosine (vector family). Same (brand, size) blocking
    as text_levenshtein_pairs so candidate generation stays a
    co-partitioned equi-join; the kernel itself is an Arrow-batched
    pandas_udf (F2's model-as-UDF path — Spark has no built-in JW),
    scoring only blocked pairs, never the cross product.

    Determinism: the Python kernel is bit-identical to DuckDB's
    jaro_winkler_similarity (same match-window scan order, same
    transposition count, same 0.7-gated 0.1-prefix bonus), so the
    0.88 threshold agrees at the boundary."""
    from fuzzy_item_matching_spark.functions.text import jaro_winkler

    p = load_table(spark, sf_dir, "part")
    a = p.alias("a")
    b = p.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .select(
            F.col("a.p_partkey").alias("id_a"),
            F.col("b.p_partkey").alias("id_b"),
            jaro_winkler(F.col("a.p_name"), F.col("b.p_name")).alias("jw"),
        )
        .filter(F.col("jw") >= 0.88)
    )


# ---------------------------------------------------------------------------
# Batched BPE fit: K merges per driver round-trip (the 50k-merge path)
# ---------------------------------------------------------------------------

_BPE_B_ROUNDS = 3
_BPE_B_K = 4  # merges accepted per round
_BPE_B_C = 32  # candidate shortlist per round


def _bpe_batched_oracle() -> str:
    """Unrolled DuckDB twin of the batched fit. Per round: pair counts
    → a top-C shortlist (total order: cnt DESC, pair ASC) → greedy
    non-overlap selection unrolled as K chained LIMIT-1 CTEs (candidate
    excluded iff it shares a symbol with any earlier selection this
    round) → all K merges applied through one pivoted scalar row.
    COALESCE(chr(1)) turns unused selection slots into no-op replaces."""
    parts = [
        """
    WITH v0 AS MATERIALIZED (
      SELECT w, COUNT(*) AS wc FROM (
        SELECT unnest({toks}) AS w FROM documents
      ) GROUP BY w
    ),
    seg0 AS MATERIALIZED (
      SELECT w, wc,
             ' ' || trim(regexp_replace(w, '(.)', '\\1 ', 'g')) || ' ' AS s
      FROM v0
    )""".format(toks=_D_TOKENS.format(c="text"))
    ]
    arms = []
    for r in range(1, _BPE_B_ROUNDS + 1):
        parts.append(f"""
    pairs{r} AS MATERIALIZED (
      SELECT p, SUM(wc) AS cnt FROM (
        SELECT wc,
               unnest(list_transform(generate_series(1, len(a) - 1),
                      i -> a[i] || ' ' || a[i + 1])) AS p
        FROM (SELECT wc, string_split(trim(s), ' ') AS a FROM seg{r - 1})
      ) GROUP BY p
    ),
    top{r} AS MATERIALIZED (
      SELECT p, CAST(cnt AS BIGINT) AS cnt,
             string_split(p, ' ')[1] AS ls, string_split(p, ' ')[2] AS rs
      FROM pairs{r} ORDER BY cnt DESC, p ASC LIMIT {_BPE_B_C}
    )""")
        prev: list[str] = []
        for k in range(1, _BPE_B_K + 1):
            if prev:
                prior = " UNION ALL ".join(
                    f"SELECT ls, rs FROM {c}" for c in prev
                )
                guard = f"""
      WHERE NOT EXISTS (
        SELECT 1 FROM ({prior}) s
        WHERE s.ls IN (t.ls, t.rs) OR s.rs IN (t.ls, t.rs)
      )"""
            else:
                guard = ""
            parts.append(f"""
    sel{r}_{k} AS MATERIALIZED (
      SELECT {k} AS sel, p, cnt, ls, rs FROM top{r} t{guard}
      ORDER BY cnt DESC, p ASC LIMIT 1
    )""")
            prev.append(f"sel{r}_{k}")
        chosen_union = " UNION ALL ".join(f"SELECT * FROM {c}" for c in prev)
        piv_cols = ", ".join(
            f"MAX(CASE WHEN sel = {k} THEN p END) AS p{k}"
            for k in range(1, _BPE_B_K + 1)
        )
        apply_s = "s"
        for k in range(1, _BPE_B_K + 1):
            pk = f"COALESCE(b.p{k}, chr(1))"
            for _ in range(_BPE_PASSES):
                apply_s = (
                    f"replace({apply_s}, ' ' || {pk} || ' ',"
                    f" ' ' || replace({pk}, ' ', '') || ' ')"
                )
        parts.append(f"""
    chosen{r} AS MATERIALIZED ({chosen_union}),
    piv{r} AS MATERIALIZED (SELECT {piv_cols} FROM chosen{r}),
    seg{r} AS MATERIALIZED (SELECT w, wc, {apply_s} AS s FROM seg{r - 1}, piv{r} b)""")
        arms.append(
            f"SELECT CAST({r} AS INT) AS round, CAST(sel AS INT) AS sel,"
            f" p AS pair, replace(p, ' ', '') AS merged, cnt FROM chosen{r}"
        )
    return ",".join(parts) + " " + " UNION ALL ".join(arms)


@query("text_bpe_fit_batched", oracle=_bpe_batched_oracle())
def text_bpe_fit_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE fit, the SCALE variant: accept up to {k} NON-OVERLAPPING
    merges per round (pairs sharing no symbol with a higher-ranked
    selection — such replaces commute, so one batched apply equals {k}
    sequential applies), chosen greedily from the round's top-{c}
    shortlist. A 50k-merge vocabulary needs 50k driver round-trips
    with the classic one-merge loop (text_bpe_fit — fine at its fixed
    8, documented there as NOT the scale path); batching divides the
    rounds by {k} while staying exactly replayable: the oracle unrolls
    every round's shortlist, the greedy selection (as {k} chained
    LIMIT-1 CTEs with NOT-EXISTS symbol guards), and the batched
    apply. Non-overlap batching is the standard scalable-BPE
    relaxation — merges within a round don't see each other's output,
    which the classic loop would.

    Plan per round: one vocabulary-frame pair count (map-side
    combinable), ONE driver collect of a {c}-row shortlist (KB-scale),
    one batched replace projection. At 100 TB: corpus touched once by
    the word count; every round is vocab-bounded.
    """
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(regex_tokenize("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    seg = words.select(
        "w",
        "wc",
        F.concat(
            F.lit(" "),
            F.trim(F.regexp_replace(F.col("w"), "(.)", "$1 ")),
            F.lit(" "),
        ).alias("s"),
    )
    out: list[tuple[int, int, str, str, int]] = []
    for r in range(1, _BPE_B_ROUNDS + 1):
        seg = seg.persist()
        # split bound once before the lambda — see text_bpe_fit's note.
        pairs = (
            seg.select(
                "wc", F.split(F.trim(F.col("s")), " ").alias("__sy")
            )
            .filter(F.size("__sy") >= 2)
            .select(
                "wc",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(__sy) - 1),"
                        " i -> concat(element_at(__sy, i), ' ',"
                        " element_at(__sy, i + 1)))"
                    )
                ).alias("p"),
            )
            .groupBy("p")
            .agg(F.sum("wc").alias("cnt"))
        )
        shortlist = (
            pairs.orderBy(F.desc("cnt"), F.asc("p")).limit(_BPE_B_C).collect()
        )
        used: set[str] = set()
        chosen: list[tuple[str, int]] = []
        for row in shortlist:
            ls, rs = row["p"].split(" ")
            if ls in used or rs in used:
                continue
            chosen.append((row["p"], row["cnt"]))
            used.update((ls, rs))
            if len(chosen) == _BPE_B_K:
                break
        s = F.col("s")
        for p, _cnt in chosen:
            merged = p.replace(" ", "")
            for _ in range(_BPE_PASSES):
                s = F.replace(s, F.lit(f" {p} "), F.lit(f" {merged} "))
        for sel, (p, cnt) in enumerate(chosen, start=1):
            out.append((r, sel, p, p.replace(" ", ""), cnt))
        nxt = seg.withColumn("s", s)
        nxt = nxt.localCheckpoint(eager=True)
        seg.unpersist()
        seg = nxt
    return spark.createDataFrame(
        out, "round int, sel int, pair string, merged string, cnt long"
    )


text_bpe_fit_batched.__doc__ = text_bpe_fit_batched.__doc__.format(
    k=_BPE_B_K, c=_BPE_B_C
)


def _unigram_oracle() -> str:
    from fuzzy_item_matching_spark.operators.unigram_lm import (
        unigram_em_sql,
    )

    return unigram_em_sql(
        f"SELECT {_D_TOKENS.format(c='text')} AS toks FROM documents"
    )


@query("text_unigram_em", oracle=_unigram_oracle())
def text_unigram_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM subword tokenizer fit (SentencePiece's model; Kudo
    2018) — the OTHER major tokenizer next to BPE: piece probabilities
    initialize from substring counts (all single chars + the top-64
    multi-char substrings ≤ 4 chars) and ONE EM iteration re-estimates
    them, the E-step computing expected piece usage over ALL
    segmentations by forward-backward dynamic programming (unrolled to
    the 12-char word cap), the M-step renormalizing. Output:
    (piece, cnt, p0, p1).

    Scale shape (operators/unigram_lm.py): the only corpus-sized work
    is the word-count groupBy — EM runs on the DISTINCT-WORD frame
    weighted by counts (the text_bpe_fit compression); the bounded
    vocabulary ships as a literal map so the whole DP is row-local
    column arithmetic, no joins. The oracle replays the identical
    recursion through 24 unrolled CTE levels with correlated
    piece-probability lookups."""
    rows = _uni_rows(spark, sf_dir)  # session memo — fit once, shared
    #                                  with the prune stage
    return spark.createDataFrame(
        rows, "piece string, cnt long, p0 double, p1 double"
    )


def _unigram_viterbi_oracle() -> str:
    from fuzzy_item_matching_spark.operators.unigram_lm import (
        unigram_viterbi_sql,
    )

    return unigram_viterbi_sql(
        f"SELECT {_D_TOKENS.format(c='text')} AS toks FROM documents"
    )


@query("text_unigram_segments", oracle=_unigram_viterbi_oracle())
def text_unigram_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM Viterbi segmentation APPLY — the `encode` half of
    the SentencePiece pair (text_unigram_em is the fit): per distinct
    word, the maximum-probability segmentation under the
    substring-count unigram model, computed by an unrolled Viterbi DP
    (argmax with the k-ascending tie-break) plus an unrolled
    backtracking walk reassembling the piece sequence. Output
    (w, wc, n_pieces, seg, best_p).

    Scale shape: identical to the fit — corpus work is one word-count
    groupBy; the DP and backtrack are row-local column arithmetic
    over the distinct-word frame with the bounded vocabulary as a
    literal map. The oracle replays DP + backtrack through unrolled
    CTEs with the same tie-break chains."""
    from fuzzy_item_matching_spark.operators.unigram_lm import (
        unigram_viterbi_segments,
    )
    from fuzzy_item_matching_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    return unigram_viterbi_segments(d, regex_tokenize("text"))


_UNI_PRUNE_TAU = 0.004  # multi-char survival threshold on p1
_UNI_MEMO: dict[str, list] = {}


def _uni_rows(spark: SparkSession, sf_dir: str) -> list:
    from fuzzy_item_matching_spark.operators.unigram_lm import (
        unigram_em_fit,
    )
    from fuzzy_item_matching_spark.tables import load_table

    if sf_dir not in _UNI_MEMO:
        d = load_table(spark, sf_dir, "documents")
        _UNI_MEMO[sf_dir] = unigram_em_fit(
            d, regex_tokenize("text")
        ).collect()  # ≤ alphabet + 64 rows — the fitted-state budget
    return _UNI_MEMO[sf_dir]


def _unigram_prune_oracle() -> str:
    return f"""
    WITH em AS MATERIALIZED (SELECT * FROM ({_unigram_oracle()}) t),
    kept AS MATERIALIZED (
      SELECT piece, cnt, p1 FROM em
      WHERE len(piece) = 1 OR p1 >= {_UNI_PRUNE_TAU!r}
    ),
    tot AS (SELECT CAST(SUM(CAST(p1 AS DECIMAL(38,18))) AS DOUBLE) AS s
            FROM kept)
    SELECT piece, cnt, p1,
           round(p1 / tot.s, 9) AS p_pruned
    FROM kept, tot
    """


@query("text_unigram_prune", oracle=_unigram_prune_oracle())
def text_unigram_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SentencePiece PRUNE stage (Kudo 2018 §3.2's loop is
    EM → prune → repeat): after the EM re-estimate, multi-char pieces
    whose posterior probability fell below {tau} leave the vocabulary
    (single chars always survive — segmentability), and the survivors
    renormalize. Composes the EM fit wholesale — the Spark side reads
    the session memo (fit once), the oracle nests the full EM
    statement as a CTE (the train_ece composition discipline), so
    fit and prune stay definitionally consistent.

    Determinism: p1 values are the EM query's 9-rounded outputs; the
    renormalizer accumulates them as DECIMAL(38,18) (exact — they sit
    on the 1e-9 grid) and the final share rounds to 9."""
    rows = _uni_rows(spark, sf_dir)
    em = spark.createDataFrame(
        [(r["piece"], r["cnt"], r["p1"]) for r in rows],
        "piece string, cnt long, p1 double",
    )
    kept = em.filter(
        (F.length("piece") == 1) | (F.col("p1") >= _UNI_PRUNE_TAU)
    )
    tot = kept.agg(
        F.sum(F.col("p1").cast("decimal(38,18)")).cast("double").alias("s")
    )
    return kept.crossJoin(F.broadcast(tot)).select(
        "piece",
        "cnt",
        "p1",
        F.round(F.col("p1") / F.col("s"), 9).alias("p_pruned"),
    )


text_unigram_prune.__doc__ = text_unigram_prune.__doc__.format(
    tau=_UNI_PRUNE_TAU
)


# ---------------------------------------------------------------------------
# Phonetic blocking (consonant-skeleton key) for entity resolution
# ---------------------------------------------------------------------------


def _skeleton_sql(col: str) -> str:
    """DuckDB consonant skeleton of a multi-word string: per word,
    first letter + vowel-class-stripped remainder, '_'-joined."""
    return (
        f"array_to_string(list_transform(string_split(lower({col}), ' '),"
        " w -> substr(w, 1, 1)"
        " || regexp_replace(substr(w, 2), '[aeiouhwy]', '', 'g')), '_')"
    )


@query(
    "text_phonetic_blocking",
    oracle=f"""
    WITH k AS (
      SELECT p_partkey, p_name, {_skeleton_sql("p_name")} AS block_key
      FROM part
    ),
    b AS (
      SELECT block_key,
             CAST(COUNT(*) AS BIGINT) AS n_parts,
             CAST(COUNT(DISTINCT p_name) AS BIGINT) AS n_names,
             CAST(COUNT(*) * (COUNT(*) - 1) / 2 AS BIGINT) AS n_cand_pairs
      FROM k GROUP BY block_key
    )
    SELECT block_key, n_parts, n_names, n_cand_pairs
    FROM b WHERE n_parts > 1
    """,
)
def text_phonetic_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PHONETIC BLOCKING for entity resolution: a consonant-skeleton
    key (per word: first letter + vowel/h/w/y-stripped remainder,
    '_'-joined) groups names that survive the misspellings vowels
    absorb — 'gear'/'gere'→'gr', 'widget'/'wydgit'→'wdgt'. The
    soundex FAMILY without the adjacent-duplicate collapse (RE2-safe:
    no backreferences, so ONE regex semantics replays in both
    engines); blocks with >1 member are the candidate-pair budget a
    phonetic blocker would hand the fuzzy scorer (J4) — the third
    blocking key family next to char-n-gram LSH (sim_*) and
    Fellegi-Sunter's exact-field blocks (serve_fs_*).

    Scale shape: the key is a row-local codegen expression (lower +
    split + per-word regex — no UDF); blocking is ONE
    map-side-combinable aggregation on the key. At 100 TB this is the
    cheapest candidate generator in the repo — a scan and a hash agg;
    n_cand_pairs makes each block's downstream join cost visible
    before anyone pays it (the sim_blocking_eval discipline).

    Determinism: pure string algebra, integer outputs.
    """
    p = load_table(spark, sf_dir, "part")
    word_skel = lambda w: F.concat(  # noqa: E731
        F.substring(w, 1, 1),
        F.regexp_replace(F.substring(w, 2, 2_000_000), "[aeiouhwy]", ""),
    )
    key = F.array_join(
        F.transform(F.split(F.lower(F.col("p_name")), " "), word_skel),
        "_",
    )
    k = p.select("p_partkey", "p_name", key.alias("block_key"))
    b = k.groupBy("block_key").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.countDistinct("p_name").alias("n_names"),
        (F.count(F.lit(1)) * (F.count(F.lit(1)) - 1) / 2)
        .cast("long")
        .alias("n_cand_pairs"),
    )
    return b.filter(F.col("n_parts") > 1)
