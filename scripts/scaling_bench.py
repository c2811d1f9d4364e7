"""Measured scaling curves (r10 VERDICT ask #2): keyshift-union
synthetic scales of sf0.1 at x1 / x4 / x10, timed over the heaviest
queries, so the 100 TB design claims are evidence, not assertion.

Scale construction — `gen`:
  Each scaled dir is the UNION of k copies of every sf0.1 fact table,
  copy i transformed so that per-copy structure is preserved EXACTLY
  while cross-copy interactions are eliminated (otherwise identical
  text/vectors across copies would manufacture quadratic near-dup /
  fuzzy-match growth that no real corpus has — catalog growth adds
  NEW items, not k clones of every item):
    - keys shift by a power-of-10 stride (> max key), so FK joins stay
      consistent across tables AND modulo-based splits (doc_id % 10)
      keep their distribution;
    - documents.text / part.p_name: a per-copy Caesar rotation of
      [a-z], [A-Z] and [0-9] via translate() — a BIJECTION on the
      character classes, so token counts, token equality, char-ngram
      equality, string lengths and therefore ALL within-copy
      similarity structure are preserved exactly, while cross-copy
      text shares neither word tokens nor char n-grams (a word-suffix
      scheme was tried first and failed exactly there: 'almond' vs
      'almondqb' still share every interior trigram, which
      manufactured quadratic cross-copy growth in the char-trigram
      cosine truth of sim_fuzzy_part_pairs / sim_blocking_eval);
      stopword hits shift for copies i>0 (a rotated 'the' is not a
      stopword) — noted, bounded, and identical at every scale k>1;
    - embeddings.embedding: circular rotation by (7*i) mod 64 — an
      ISOMETRY, so all within-copy distances/norms are bit-preserved
      while cross-copy cosines decorrelate;
    - region/nation stay fixed (TPC-H keeps dimensions constant);
      bounded-cardinality attributes (p_brand, event_type, lang,
      source) stay fixed, so group counts hold and per-group sizes
      grow — the honest production shape.
  x1 is generated through the SAME pipeline (k=1 = identity transform)
  so every scale shares file layout and timestamp physical type; raw
  sf0.1 stores TIMESTAMP(NANOS), the rewrite stores micros.

Timing — `run`:
  One Spark session per scale (the bench.py conventions: noop sink,
  clearCache between queries, min over passes plus the recorded cold
  pass). Emits one JSON line per scale and, at the end, the ratio
  table that docs/SCALING.md commits.

Usage:
  python scripts/scaling_bench.py gen [k ...]        # default 1 4 10
  python scripts/scaling_bench.py run <k> [out.json]
  python scripts/scaling_bench.py report x1.json x4.json x10.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    "scale",
)

# Power-of-10 key strides (> max key at sf0.1) per shifted column.
STRIDE = {
    "custkey": 100_000,  # also events.user_id (customer-key domain)
    "orderkey": 1_000_000,
    "partkey": 100_000,
    "suppkey": 10_000,
    "doc_id": 10_000,
    "vec_id": 10_000,
    "event_id": 1_000_000,
}

QUERIES = [
    "serve_end_to_end",
    "sim_blocking_eval",
    "sim_ann_ivfpq_topk",
    "dedup_minhash_recall",
    "dedup_canonical_closure",
    "rel_pagerank_brands",
    "pipe_corpus_clean",
    "ts_doremi_mixture",
    "train_sparse_logreg",
    "ts_charlm_score",
    "dedup_incremental_minhash",
    "sim_fuzzy_part_pairs",
]


_LOWER = "abcdefghijklmnopqrstuvwxyz"
_DIGIT = "0123456789"


def _caesar(expr: str, i: int) -> str:
    """translate() SQL rotating each character class by ``i``."""
    if i == 0:
        return expr
    lo = _LOWER[i:] + _LOWER[:i]
    dg = _DIGIT[i % 10:] + _DIGIT[: i % 10]
    src_map = _LOWER + _LOWER.upper() + _DIGIT
    dst_map = lo + lo.upper() + dg
    return f"translate({expr}, '{src_map}', '{dst_map}')"


def _copy_sql(table: str, i: int) -> str:
    """SELECT for copy ``i`` of ``table`` (i=0 is the identity)."""
    src = f"'{SRC}/{table}.parquet'"
    s = {k: v * i for k, v in STRIDE.items()}
    if table in ("region", "nation"):
        return f"SELECT * FROM {src}" if i == 0 else ""
    if table == "customer":
        return (
            f"SELECT c_custkey + {s['custkey']} AS c_custkey, c_name,"
            f" c_nationkey, c_acctbal, c_mktsegment FROM {src}"
        )
    if table == "supplier":
        return (
            f"SELECT s_suppkey + {s['suppkey']} AS s_suppkey, s_name,"
            f" s_nationkey, s_acctbal FROM {src}"
        )
    if table == "part":
        name = _caesar("p_name", i)
        return (
            f"SELECT p_partkey + {s['partkey']} AS p_partkey,"
            f" {name} AS p_name, p_brand, p_type, p_size, p_retailprice"
            f" FROM {src}"
        )
    if table == "orders":
        return (
            f"SELECT o_orderkey + {s['orderkey']} AS o_orderkey,"
            f" o_custkey + {s['custkey']} AS o_custkey, o_orderstatus,"
            f" o_totalprice, o_orderdate, o_orderpriority FROM {src}"
        )
    if table == "lineitem":
        return (
            f"SELECT l_orderkey + {s['orderkey']} AS l_orderkey,"
            f" l_partkey + {s['partkey']} AS l_partkey,"
            f" l_suppkey + {s['suppkey']} AS l_suppkey, l_linenumber,"
            f" l_quantity, l_extendedprice, l_discount, l_tax,"
            f" l_returnflag, l_linestatus, l_shipdate FROM {src}"
        )
    if table == "events":
        return (
            f"SELECT event_id + {s['event_id']} AS event_id, ts,"
            f" user_id + {s['custkey']} AS user_id, event_type, value,"
            f" props FROM {src}"
        )
    if table == "documents":
        text = _caesar("text", i)
        return (
            f"SELECT doc_id + {s['doc_id']} AS doc_id, {text} AS text,"
            f" lang, source, n_chars FROM {src}"
        )
    if table == "embeddings":
        r = (7 * i) % 64
        emb = (
            "embedding"
            if r == 0
            else f"CAST(embedding[{r + 1}:] || embedding[:{r}] AS FLOAT[])"
        )
        return (
            f"SELECT vec_id + {s['vec_id']} AS vec_id,"
            f" {emb} AS embedding, label FROM {src}"
        )
    raise ValueError(table)


# --- Zipf-skewed scale (r11 VERDICT ask #2) -------------------------
# Keyshift-union preserves key UNIFORMITY, so the one 100 TB hazard
# the x1/x4/x10 curves cannot see is hub skew. The skewed variant
# keeps the exact same 10-copy union but makes a few keys hot:
#   - lineitem: for copies i>0, 1/_SKEW_MOD of line rows (hash-gated on
#     (orderkey, linenumber) — deterministic) point their l_partkey at
#     one of the 8 copy-0 HUB parts instead of the shifted key. Hub
#     parts end up on ~1 in 20 of ALL orders: the co-purchase graph
#     (LPA / PPR), part joins, and part-keyed aggs see true power-law
#     hubs.
#   - documents: for copies i>0, 1/_SKEW_MOD of docs carry one of 16
#     copy-0 HUB TEXTS verbatim (duplicate classes ~150 docs each at
#     x10) — minhash band buckets, jaccard postings and simhash
#     fingerprints all develop hub buckets, exactly the duplicate-
#     heavy shape the collapse gates exist for.
# Copy 0 stays the identity so per-copy structure is otherwise the
# x10 construction verbatim; t(xs10)/t(x10) isolates pure skew cost.
_SKEW_MOD = 20  # 1-in-20 rows → 5% hub mass


def _skew_copy_sql(table: str, i: int) -> str:
    src = f"'{SRC}/{table}.parquet'"
    s = {k: v * i for k, v in STRIDE.items()}
    if i > 0 and table == "lineitem":
        return (
            f"SELECT l_orderkey + {s['orderkey']} AS l_orderkey,"
            f" CASE WHEN hash(l_orderkey * 8 + l_linenumber) % {_SKEW_MOD} = 0"
            f"      THEN l_partkey % 8"
            f"      ELSE l_partkey + {s['partkey']} END AS l_partkey,"
            f" l_suppkey + {s['suppkey']} AS l_suppkey, l_linenumber,"
            f" l_quantity, l_extendedprice, l_discount, l_tax,"
            f" l_returnflag, l_linestatus, l_shipdate FROM {src}"
        )
    if i > 0 and table == "documents":
        text = _caesar("d.text", i)
        return (
            f"SELECT d.doc_id + {s['doc_id']} AS doc_id,"
            f" CASE WHEN hash(d.doc_id) % {_SKEW_MOD} = 0 THEN h.text"
            f"      ELSE {text} END AS text,"
            f" d.lang, d.source,"
            f" CASE WHEN hash(d.doc_id) % {_SKEW_MOD} = 0 THEN h.n_chars"
            f"      ELSE d.n_chars END AS n_chars"
            f" FROM {src} d JOIN {src} h ON h.doc_id = d.doc_id % 16"
        )
    return _copy_sql(table, i)


# --- Hub-TOKEN skew (r14, VERDICT r13 ask #5) -----------------------
# The xs10 skew makes KEYS hot (hub parts, duplicate docs). The
# vocabulary-keyed births (ts_coverage_greedy's postings,
# ts_rake_keyphrases' word stats, ts_stolcke_prune's n-gram tables)
# ride TERM-keyed aggregations that hub keys never stress: a
# duplicated document adds hub POSTINGS but its terms stay uniform.
# The hub-token variant replaces 1/_SKEW_MOD of copy-i>0 docs with a
# single hub token repeated to the original length (4 hub tokens,
# hash-assigned), so ~5% of ALL corpus tokens collapse onto 4
# vocabulary keys — a >1000× hub TERM against the ~40k-term uniform
# vocabulary, the adversarial shape for term-keyed partial
# aggregation. Everything else is the x10 construction verbatim, so
# t(xh10)/t(x10) isolates the pure hub-term cost.
_HUB_TOKENS = ("hubalpha", "hubbeta", "hubgamma", "hubdelta")


def _hubtok_copy_sql(table: str, i: int) -> str:
    if i == 0 or table != "documents":
        return _copy_sql(table, i)
    src = f"'{SRC}/documents.parquet'"
    s = STRIDE["doc_id"] * i
    text = _caesar("text", i)
    hub = (
        "CASE hash(doc_id + 13) % 4"
        + "".join(
            f" WHEN {j} THEN '{t}'" for j, t in enumerate(_HUB_TOKENS[:3])
        )
        + f" ELSE '{_HUB_TOKENS[3]}' END"
    )
    return (
        f"SELECT doc_id + {s} AS doc_id,"
        f" CASE WHEN hash(doc_id) % {_SKEW_MOD} = 0"
        f" THEN trim(repeat({hub} || ' ',"
        f" greatest(1, CAST(n_chars // 10 AS BIGINT))))"
        f" ELSE {text} END AS text, lang, source,"
        f" CASE WHEN hash(doc_id) % {_SKEW_MOD} = 0"
        f" THEN length(trim(repeat({hub} || ' ',"
        f" greatest(1, CAST(n_chars // 10 AS BIGINT)))))"
        f" ELSE n_chars END AS n_chars"
        f" FROM {src}"
    )


def gen(ks: list[int], skew: bool = False, hubtok: bool = False) -> None:
    import duckdb

    tables = [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]
    copy_sql = (
        _hubtok_copy_sql if hubtok else _skew_copy_sql if skew else _copy_sql
    )
    pfx = "h" if hubtok else "s" if skew else ""
    for k in ks:
        out = os.path.join(ROOT, f"x{pfx}{k}")
        os.makedirs(out, exist_ok=True)
        t0 = time.monotonic()
        for t in tables:
            parts = [q for i in range(k) if (q := copy_sql(t, i))]
            union = "\nUNION ALL\n".join(parts)
            duckdb.sql(
                f"COPY ({union}) TO '{out}/{t}.parquet'"
                " (FORMAT PARQUET, ROW_GROUP_SIZE 131072)"
            )
        print(
            f"[gen] {os.path.basename(out)} -> {out}"
            f" in {time.monotonic() - t0:.1f}s"
        )


def run(k: int | str, out_path: str | None) -> None:
    # k may be a skew token like 's10' -> dir xs10, scale label 's10'
    os.environ.setdefault(
        "SPARK_GRAFT_SCRATCH", f"{ROOT}/run-x{k}-{os.getpid()}"
    )
    global QUERIES
    sel = os.environ.get("SPARK_GRAFT_SCALE_QUERIES")
    if sel == "ALL":
        # breadth sweep: every benched query (bench.py's exclusions —
        # O(n²) oracle twins and restart harnesses — apply here too)
        import bench as _bench
        from fuzzy_item_matching_spark.queries import load_all as _la

        QUERIES = [
            n
            for n in sorted(_la())
            if n not in _bench.EXCLUDE
            and not n.startswith(_bench.EXCLUDE_PREFIXES)
        ]
    elif sel:
        QUERIES = sel.split(",")
    sf_dir = os.path.join(ROOT, f"x{k}")
    from fuzzy_item_matching_spark import get_spark
    from fuzzy_item_matching_spark.queries import load_all

    spark = get_spark(app_name=f"scaling-x{k}")
    registry = load_all()
    spark.range(1000).selectExpr("sum(id)").collect()

    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2")))
    times: dict[str, list[float]] = {}
    for p in range(passes):
        for name in QUERIES:
            q = registry[name]
            t0 = time.monotonic()
            try:
                q.fn(spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
                dt = time.monotonic() - t0
            except Exception as e:  # noqa: BLE001 — record, keep timing
                dt = -1.0
                print(f"[x{k}] {name} FAILED: {e}", file=sys.stderr)
            finally:
                spark.catalog.clearCache()
            times.setdefault(name, []).append(round(dt, 3))
            print(f"[x{k} pass{p + 1}] {name}: {dt:.2f}s", file=sys.stderr)
    payload = json.dumps(
        {
            "scale": k,
            "queries": {
                n: (-1.0 if -1.0 in ts else min(ts))
                for n, ts in times.items()
            },
            "cold": {n: ts[0] for n, ts in times.items()},
            "passes": times,
        }
    )
    print(payload)
    if out_path:
        with open(out_path, "w") as fh:
            fh.write(payload + "\n")


def report(paths: list[str]) -> None:
    recs = {r["scale"]: r for r in (json.load(open(p)) for p in paths)}
    base = recs[min(recs)]
    b = min(recs)  # ratio denominator = SMALLEST scale passed — label
    # it honestly so a report without the x1 run can't masquerade as
    # t(xk)/t(x1)
    print("| query | " + " | ".join(f"x{k} (s)" for k in sorted(recs))
          + " | " + " | ".join(
              f"t(x{k})/t(x{b})" for k in sorted(recs) if k != b)
          + " |")
    print("|" + "---|" * (2 * len(recs)))
    for name in base["queries"]:
        t1 = base["queries"].get(name, -1.0)
        cells = [f"{recs[k]['queries'].get(name, -1.0):.2f}"
                 for k in sorted(recs)]
        ratios = [
            ("n/a" if t1 <= 0 or recs[k]["queries"].get(name, -1) <= 0
             else f"{recs[k]['queries'][name] / t1:.2f}")
            for k in sorted(recs) if k != min(recs)
        ]
        print(f"| {name} | " + " | ".join(cells) + " | "
              + " | ".join(ratios) + " |")


def report_skew(uniform_path: str, skew_path: str) -> None:
    """Skew table: t(xs10)/t(x10) per query — the pure cost of hub
    keys at identical data volume (same 10-copy union, same row
    counts; only the key/text distribution differs)."""
    u = json.load(open(uniform_path))
    sk = json.load(open(skew_path))
    print("| query | x10 uniform (s) | xs10 skewed (s) | skew ratio |")
    print("|---|---|---|---|")
    for name in u["queries"]:
        tu = u["queries"].get(name, -1.0)
        ts = sk["queries"].get(name, -1.0)
        r = "n/a" if tu <= 0 or ts <= 0 else f"{ts / tu:.2f}"
        print(f"| {name} | {tu:.2f} | {ts:.2f} | {r} |")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "gen"
    if cmd == "gen":
        gen([int(a) for a in sys.argv[2:]] or [1, 4, 10])
    elif cmd == "gen-skew":
        gen([int(a) for a in sys.argv[2:]] or [10], skew=True)
    elif cmd == "gen-hubtok":
        gen([int(a) for a in sys.argv[2:]] or [10], hubtok=True)
    elif cmd == "report-skew":
        report_skew(sys.argv[2], sys.argv[3])
    elif cmd == "run":
        tok = sys.argv[2]
        run(int(tok) if tok.isdigit() else tok,
            sys.argv[3] if len(sys.argv) > 3 else None)
    elif cmd == "report":
        report(sys.argv[2:])
    else:
        raise SystemExit(f"unknown command {cmd}")
