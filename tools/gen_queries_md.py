#!/usr/bin/env python
"""Regenerate QUERIES.md — the query→gate inventory for the driver
contract. Run from the repo root."""
import os
import re
import sys


def main():
    sys.path.insert(0, os.getcwd())
    import __ray_entry__ as m

    q = m.queries()
    o = m.oracle_sql()
    g = open("tools/gen_query_goldens.py").read()
    gold = set(re.findall(r'^\s+"([a-z_0-9]+)",\s*$', g, re.M))
    lines = [
        "# Query index — driver contract `__ray_entry__.queries()`",
        "",
        "Auto-generated inventory (tools/gen_queries_md.py). Gates:",
        "- **sql** — DuckDB oracle in `oracle_sql()`; the driver compares rows,",
        "  schema and value hashes at sf0.01 (also parametrized in",
        "  tests/test_entry_oracle.py).",
        "- **golden** — sha-pinned parquet under tests/golden/query/",
        "  (tests/test_query_goldens.py; regenerate with",
        "  tools/gen_query_goldens.py).",
        "- **pytest** — rows-only for the driver; correctness gated by a",
        "  dedicated oracle test (driver-vs-distributed byte equality, numeric",
        "  power-iteration, recall/error bounds, or reference-generated",
        "  fixtures).",
        "",
        "| # | query | gate |",
        "|---|---|---|",
    ]
    for i, name in enumerate(sorted(q), 1):
        gate = "sql" if name in o else (
            "golden" if name in gold else "pytest")
        lines.append(f"| {i} | `{name}` | {gate} |")
    n_sql = len(o)
    n_gold = len(gold - set(o))
    lines += [
        "",
        f"Totals: {len(q)} queries — {n_sql} sql, {n_gold} golden, "
        f"{len(q) - n_sql - n_gold} pytest-only.",
        "",
    ]
    open("QUERIES.md", "w").write("\n".join(lines))
    print(f"QUERIES.md: {len(q)} queries")


if __name__ == "__main__":
    main()
