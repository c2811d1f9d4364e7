"""Changed-operator impact map (r12 VERDICT ask #8).

Given operator symbols touched in a round, emit a markdown table
mapping each symbol -> the registered queries whose function source
references it (one level of transitive closure through the operators
package, so a helper refactor surfaces consumers of its callers) ->
each query's newest driver-green CORRECTNESS row. Rotation arguments
can then be made from the dependency graph instead of recency.

Usage:
  PYTHONPATH=/root/repo python scripts/impact_map.py sign_bucket_frame ...
"""

from __future__ import annotations

import inspect
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_driver_row(name: str) -> str:
    best = None
    for f in sorted(os.listdir(REPO)):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        try:
            rec = json.load(open(os.path.join(REPO, f)))
        except ValueError:
            continue
        row = rec.get(name)
        if row and row.get("rows_match") and not row.get("err"):
            best = int(m.group(1))
    return f"r{best:02d}" if best else "none"


def main(symbols: list[str]) -> None:
    import fuzzy_item_matching_spark.operators as ops_pkg
    from fuzzy_item_matching_spark.queries import load_all

    # one transitive level through the operators package
    ops_dir = os.path.dirname(ops_pkg.__file__)
    closure = set(symbols)
    for fn in os.listdir(ops_dir):
        if not fn.endswith(".py"):
            continue
        src = open(os.path.join(ops_dir, fn)).read()
        for m in re.finditer(r"^def (\w+)", src, re.M):
            fname = m.group(1)
            body_start = m.end()
            nxt = src.find("\ndef ", body_start)
            body = src[body_start : nxt if nxt > 0 else len(src)]
            if any(s in body for s in symbols) and fname not in symbols:
                closure.add(fname)
    reg = load_all()
    rows = []
    for sym in sorted(closure):
        consumers = []
        for name, q in reg.items():
            try:
                src = inspect.getsource(q.fn)
            except (OSError, TypeError):
                continue
            if re.search(rf"\b{re.escape(sym)}\b", src):
                consumers.append(name)
        if consumers:
            rows.append((sym, consumers))
    print("| touched symbol | consuming queries (newest driver row) |")
    print("|---|---|")
    for sym, consumers in rows:
        cell = ", ".join(
            f"`{n}` ({newest_driver_row(n)})" for n in sorted(consumers)
        )
        print(f"| `{sym}` | {cell} |")


if __name__ == "__main__":
    main(sys.argv[1:] or ["sign_bucket_frame", "lsh_multiprobe_topk"])
