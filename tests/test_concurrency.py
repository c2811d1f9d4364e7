"""Session thread-safety: a shared SparkSession serving several
queries at once (the notebook/JDBC/serving reality) must return the
same results as serial execution — no cross-talk through the session
conf, the cache, or temp views.

The pool deliberately mixes query families that mutate session state
scoped to themselves (streaming queries flip shuffle.partitions and
restore it; sources write scratch paths) with pure relational reads.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from fuzzy_item_matching_spark.queries import load_all
from tests.conftest import SF_CHECK

NAMES = [
    "rel_pricing_summary",
    "rel_status_share",
    "rel_grouping_sets",
    "rel_value_outliers",
    "ts_token_stats",
    "ts_countmin_heavy",
    "vec_l2_norm",
    "dedup_exact_docs",
]


def test_concurrent_queries_match_serial(spark):
    reg = load_all()

    def run(name: str):
        rows = reg[name].fn(spark, SF_CHECK).collect()
        return sorted(map(tuple, rows))

    serial = {n: run(n) for n in NAMES}
    with ThreadPoolExecutor(max_workers=len(NAMES)) as pool:
        futures = {n: pool.submit(run, n) for n in NAMES}
        concurrent = {n: f.result(timeout=300) for n, f in futures.items()}
    for n in NAMES:
        assert concurrent[n] == serial[n], f"{n} differs under concurrency"
