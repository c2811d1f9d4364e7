"""Driver-check ordering invariants (see queries/__init__.CHECK_PRIORITY).

The round driver verifies ``queries()`` entries in registration order
under a bounded budget (round 2 stopped at exactly 50), so the registry
must present oracle-bearing queries first and rows-only queries last.
These tests don't need a SparkSession — they only inspect the registry.
"""

from fuzzy_item_matching_spark.queries import CHECK_PRIORITY, load_all

DRIVER_PREFIX_BUDGET = 50


def test_priority_names_unique():
    dupes = [n for n in set(CHECK_PRIORITY) if CHECK_PRIORITY.count(n) > 1]
    assert dupes == [], f"duplicate CHECK_PRIORITY entries: {dupes}"


def test_priority_names_all_registered():
    reg = load_all()
    unknown = [n for n in CHECK_PRIORITY if n not in reg]
    assert unknown == [], f"CHECK_PRIORITY names not in registry: {unknown}"


def test_every_query_listed_in_priority():
    reg = load_all()
    unlisted = [n for n in reg if n not in CHECK_PRIORITY]
    assert unlisted == [], f"registered queries missing from CHECK_PRIORITY: {unlisted}"


def test_driver_prefix_is_all_oracle_bearing():
    """r11 relaxation (pre-announced in the r10 ledger): the rotation
    that clears the never-checked backlog pulls the remaining
    rows-only queries into the prefix TAIL so they finally earn a
    driver record. The invariant is now 'oracle-bearing before
    rows-only within the prefix' — a rows-only entry must never
    displace an oracle-bearing one from a stronger (earlier) slot."""
    reg = load_all()
    prefix = list(reg.items())[:DRIVER_PREFIX_BUDGET]
    first_rows_only = next(
        (i for i, (_, q) in enumerate(prefix) if q.oracle is None),
        len(prefix),
    )
    misordered = [
        n for n, q in prefix[first_rows_only:] if q.oracle is not None
    ]
    assert misordered == [], (
        f"oracle-bearing prefix queries ordered after rows-only ones: {misordered}"
    )


def test_rows_only_in_prefix_tail_or_global_tail():
    """Outside the driver prefix, rows-only queries must still hold the
    global tail (their check is weaker at any position, so they never
    displace an oracle-bearing query from the ordered backlog)."""
    reg = load_all()
    names = list(reg)[DRIVER_PREFIX_BUDGET:]
    first_rows_only = next(
        (i for i, n in enumerate(names) if reg[n].oracle is None), len(names)
    )
    tail_oracle = [n for n in names[first_rows_only:] if reg[n].oracle is not None]
    assert tail_oracle == [], (
        f"oracle-bearing queries ordered after rows-only ones: {tail_oracle}"
    )


def test_catalog_counts_match_registry():
    """README.md and docs/QUERIES.md state the registry size; both went
    stale in r06 (said 168/163 while the registry held 170/165). Pin
    them to load_all() so a new query without a catalog regen fails
    here instead of in review."""
    import pathlib

    reg = load_all()
    n = len(reg)
    ex = sum(1 for q in reg.values() if q.oracle is not None)
    root = pathlib.Path(__file__).resolve().parents[1]
    readme = (root / "README.md").read_text()
    assert f"{n} named queries ({ex} with exact DuckDB oracles)" in readme, (
        f"README.md query counts stale: registry has {n}/{ex} — "
        "run scripts/gen_query_catalog.py and update README.md"
    )
    catalog = (root / "docs" / "QUERIES.md").read_text()
    assert f"**{n} queries, {ex} with exact oracles.**" in catalog, (
        f"docs/QUERIES.md stale: registry has {n}/{ex} — "
        "run scripts/gen_query_catalog.py"
    )


def test_verification_counts_match_registry():
    """docs/VERIFICATION.md §1/§3 state live registry counts; they went
    stale in r09 (said 247/253 at a 248/254 surface). The counts are
    restamped by scripts/gen_query_catalog.py — pin them here."""
    import pathlib

    reg = load_all()
    n = len(reg)
    ex = sum(1 for q in reg.values() if q.oracle is not None)
    root = pathlib.Path(__file__).resolve().parents[1]
    text = (root / "docs" / "VERIFICATION.md").read_text()
    assert f"{ex} of {n} registered queries carry" in text, (
        f"docs/VERIFICATION.md §1 stale: registry has {ex}/{n} — "
        "run scripts/gen_query_catalog.py"
    )
    assert f"## 3. Rows-only queries ({n - ex})" in text, (
        "docs/VERIFICATION.md §3 stale — run scripts/gen_query_catalog.py"
    )
