"""One-shot refactoring script (VERDICT r4 item 7): extract the DuckDB oracle
surface out of __spark_entry__.py into an ``oracles/`` package, preserving
source order and leading comments, without changing the registry API.

- oracles/shared.py   : probe/fixture constants referenced by BOTH the Spark
                        queries and the oracle SQL (LAT_IN, banners, ...)
- oracles/__init__.py : every _*_SQL constant, every _*_sql generator, and
                        oracle_sql() itself
- __spark_entry__.py  : everything else + imports; re-exports oracle_sql and
                        the generator names tests touch

Run from the repo root; writes in place (git is the undo).
"""

from __future__ import annotations

import ast
import re

ENTRY = "__spark_entry__.py"

# shared by both sides (measured: tools/split analysis)
SHARED = [
    "LAT_IN", "LAT_SOUTH", "LON_IN", "PLOT_GY_CENTERS",
    "_BANNER1", "_BANNER2", "_BM25_QUERIES", "_EVENT_TYPES",
    "_LR_ANCHOR", "_LR_PATH", "_MIX_WEIGHTS", "_NORM_P0", "_NORM_P2",
    "_OVL_H1", "_OVL_OX", "_OVL_OY", "_OVL_W1",
]
# oracle-only names the regex misses
ORACLE_EXTRA = {
    "NEAREST_GX_EXPR", "PASS_OF_LON_IN", "PLOT_GX_EXPR", "RANGE_OF_LAT_IN",
    "_QUANTILE_V_CTE", "_minhash_match_sum", "_rep_ctes", "_sql_chr_str",
}
# moved names __spark_entry__ must re-export (external consumers: tests)
REEXPORT = [
    "oracle_sql", "_poly_sql", "_mix31_sql", "_bpe_stages_sql",
    "_bpe_encode_sql", "_principal_axis_sql",
]


def main() -> None:
    src = open(ENTRY).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    def names_of(node):
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            return [node.name]
        if isinstance(node, ast.Assign):
            out = []
            for t in node.targets:
                if isinstance(t, ast.Name):
                    out.append(t.id)
                elif isinstance(t, ast.Tuple):
                    out += [e.id for e in t.elts if isinstance(e, ast.Name)]
            return out
        if isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            return [node.target.id]
        return []

    def is_oracle(names):
        return any(
            re.match(r"^_[A-Z0-9_]+_SQL$", n)
            or re.match(r"^_.*_sql$", n)
            or n == "oracle_sql"
            or n in ORACLE_EXTRA
            for n in names
        )

    body = tree.body
    # segment i spans (prev end, node end] so leading comments travel along
    segs = []
    prev_end = 0
    for node in body:
        start = prev_end  # 0-based line index
        end = node.end_lineno  # 1-based inclusive
        segs.append((names_of(node), node, start, end))
        prev_end = end

    shared_parts, oracle_parts, entry_parts = [], [], []
    for names, node, start, end in segs:
        text = "".join(lines[start:end])
        if names and all(n in SHARED for n in names):
            shared_parts.append(text)
        elif names and is_oracle(names):
            oracle_parts.append(text)
        else:
            entry_parts.append(text)

    shared_imports = ", ".join(SHARED)
    with open("oracles/shared.py", "w") as f:
        f.write(
            '"""Probe/fixture constants shared by the Spark queries in\n'
            "__spark_entry__.py AND the DuckDB oracle SQL in oracles/ — the\n"
            "single source of truth for every literal both engines must spell\n"
            'identically (CLAUDE.md invariants)."""\n\n'
            "from __future__ import annotations\n\n"
        )
        f.write("\n".join(p if p.endswith("\n") else p + "\n" for p in shared_parts))

    with open("oracles/__init__.py", "w") as f:
        f.write(
            '"""DuckDB oracle surface for the driver contract: every _*_SQL\n'
            "constant, every _*_sql generator, and oracle_sql() itself —\n"
            "extracted from __spark_entry__.py (VERDICT r4 item 7) with source\n"
            "order preserved. __spark_entry__ re-exports oracle_sql, so the\n"
            'driver and tools/check_oracles.py see an unchanged API."""\n\n'
            "from __future__ import annotations\n\n"
            f"from .shared import {shared_imports}\n\n"
        )
        f.write("\n".join(p if p.endswith("\n") else p + "\n" for p in oracle_parts))

    out = "".join(entry_parts)
    # insert the two import lines after the pyspark imports block
    anchor = "from pyspark.sql import functions as F\n"
    assert anchor in out
    out = out.replace(
        anchor,
        anchor
        + "\nfrom oracles import (  # noqa: F401  (re-exported driver/test API)\n    "
        + ",\n    ".join(REEXPORT)
        + ",\n)\nfrom oracles.shared import (  # noqa: F401\n    "
        + ",\n    ".join(SHARED)
        + ",\n)\n",
        1,
    )
    with open(ENTRY, "w") as f:
        f.write(out)
    print("wrote oracles/shared.py, oracles/__init__.py, new", ENTRY)


if __name__ == "__main__":
    main()
