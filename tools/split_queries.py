#!/usr/bin/env python
"""One-shot refactoring script (r4 verdict item 2): split the 11k-line
``queries.py`` monolith into a ``queries/`` package —

    queries/__init__.py   aggregator: imports family modules in an
                          order that keeps the original first query
                          first, re-exports the registry API and every
                          shared helper (tests import private helpers
                          like ``_ivf_centroids`` from the package)
    queries/_registry.py  register() + the registry dicts/accessors
    queries/_shared.py    ALL non-query top-level code (helpers,
                          oracle constants, lru_caches) in original
                          order, with a generated __all__ so family
                          modules can ``import *`` underscore names
    queries/<family>.py   the @register blocks, classified by each
                          query's primary engine import, original
                          relative order preserved, none >2,500 lines

Safe to delete after the split lands; kept in tools/ as the record of
how the mechanical transformation was produced.
"""

from __future__ import annotations

import ast
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "dea05_e2e_kafka_streaming_pipeline_spark")
SRC = os.path.join(PKG, "queries.py")
OUT = os.path.join(PKG, "queries")

INFRA = {
    "QueryFn", "_QUERIES", "_ORACLES", "_NO_BENCH",
    "register", "queries", "oracles", "bench_queries",
}

# (regex over the query block text, family module) — first match wins
FAMILIES = [
    (r"operators\.multimodal", "multimodal"),
    (r"operators\.(dedup|similarity)", "dedup_ann"),
    (r"operators\.graph", "graph"),
    (r"operators\.text", "text"),
    (r"operators\.curation", "curation"),
    (r"operators\.sketches", "sketches"),
    (r"operators\.linkage", "linkage"),
    (r"operators\.quality", "quality"),
    (r"operators\.cdc", "cdc_lake"),
    (r"plans\.analytics", "stats"),
    (r"plans\.incremental", "incremental"),
    (r"plans\.(gold|medallion)", "gold"),
    (r"sources\.(txlog|catalog|layout|sinks|avro)", "cdc_lake"),
    (r"functions\.", "functions_sql"),
    (r"operators\.", "misc_ops"),
    (r"plans\.", "stats"),
]
DEFAULT_FAMILY = "core_sql"
MAX_LINES = 2400


def classify(text: str) -> str:
    for pat, fam in FAMILIES:
        if re.search(pat, text):
            return fam
    return DEFAULT_FAMILY


def main() -> int:
    src = open(SRC).read()
    lines = src.splitlines(keepends=True)
    tree = ast.parse(src)

    # --- segment the file: each top-level node owns [start, end] lines,
    # with comments/blanks immediately above a node attached to it
    nodes = tree.body
    segs = []  # (node, start_line_1idx, end_line_1idx)
    prev_end = 0
    for node in nodes:
        start = min(
            [node.lineno]
            + [d.lineno for d in getattr(node, "decorator_list", [])]
        )
        # pull preceding comments/blank lines into this segment
        s = start
        while s - 1 > prev_end:
            stripped = lines[s - 2].strip()
            if stripped.startswith("#") or not stripped:
                s -= 1
            else:
                break
        segs.append((node, s, node.end_lineno))
        prev_end = node.end_lineno

    def text_of(seg):
        _, s, e = seg
        return "".join(lines[s - 1 : e])

    docstring = ""
    header_imports = []
    registry_parts = []
    shared_parts = []
    query_parts = []  # (family, name, text)

    for i, seg in enumerate(segs):
        node = seg[0]
        t = text_of(seg)
        if (
            i == 0
            and isinstance(node, ast.Expr)
            and isinstance(node.value, ast.Constant)
        ):
            docstring = t
            continue
        if isinstance(node, (ast.Import, ast.ImportFrom)):
            header_imports.append(t)
            continue
        if isinstance(node, ast.FunctionDef) and any(
            isinstance(d, ast.Call) and getattr(d.func, "id", "") == "register"
            for d in node.decorator_list
        ):
            query_parts.append((classify(t), node.name, t))
            continue
        is_infra = (
            isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef))
            and node.name in INFRA
        ) or (
            isinstance(node, ast.Assign)
            and any(
                isinstance(x, ast.Name) and x.id in INFRA
                for x in node.targets
            )
        ) or (
            isinstance(node, ast.AnnAssign)
            and isinstance(node.target, ast.Name)
            and node.target.id in INFRA
        )
        if is_infra:
            registry_parts.append(t)
        else:
            shared_parts.append((node, t))

    os.makedirs(OUT, exist_ok=True)

    # --- _registry.py
    with open(os.path.join(OUT, "_registry.py"), "w") as f:
        f.write(
            '"""Registry plumbing: the @register decorator and the '
            'driver-facing\naccessors. Family modules import register '
            "from here; the package\n__init__ imports the accessors "
            'back out."""\n\n'
            "from __future__ import annotations\n\n"
            "from collections.abc import Callable\n\n"
            "from pyspark.sql import DataFrame, SparkSession\n\n"
        )
        f.write("\n".join(p.rstrip("\n") + "\n" for p in registry_parts))

    # --- _shared.py: header imports + non-query top-level code, original
    # order, with __all__ exposing every name (underscores included)
    shared_names = []
    # names brought in by the header imports (F, lru_cache, ORDERS_SQL,
    # build_daily_sales, ...) — the family modules reference them too,
    # so __all__ must re-export them through the star import
    for node in nodes:
        if isinstance(node, ast.Import):
            shared_names.extend(
                (a.asname or a.name.split(".")[0]) for a in node.names
            )
        elif isinstance(node, ast.ImportFrom):
            shared_names.extend((a.asname or a.name) for a in node.names)
    for node, _t in shared_parts:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            shared_names.append(node.name)
        elif isinstance(node, ast.Assign):
            shared_names.extend(
                x.id for x in node.targets if isinstance(x, ast.Name)
            )
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            shared_names.append(node.target.id)
    with open(os.path.join(OUT, "_shared.py"), "w") as f:
        f.write(
            '"""Shared helpers of the query registry: oracle SQL '
            "constants,\nper-process lru_cached artifacts (txlog "
            "tables, IVF layouts, BPE\nmerges), and the entity CTEs — "
            "everything the family modules'\nqueries reference besides "
            'the operators themselves."""\n\n'
        )
        for t in header_imports:
            f.write(t if t.endswith("\n") else t + "\n")
        f.write("\n")
        for _node, t in shared_parts:
            f.write("\n" + t.rstrip("\n") + "\n")
        f.write("\n__all__ = [\n")
        for n in shared_names:
            f.write(f'    "{n}",\n')
        f.write("]\n")

    # --- family modules (split further if over MAX_LINES)
    fam_order = []  # order of first appearance
    by_fam: dict[str, list[tuple[str, str]]] = {}
    for fam, name, t in query_parts:
        if fam not in by_fam:
            by_fam[fam] = []
            fam_order.append(fam)
        by_fam[fam].append((name, t))

    fam_header = (
        "from __future__ import annotations\n\n"
        "from pyspark.sql import DataFrame, SparkSession\n"
        "from pyspark.sql import functions as F\n\n"
        "from dea05_e2e_kafka_streaming_pipeline_spark.queries._registry import (  # noqa: F401\n"
        "    register,\n)\n"
        "from dea05_e2e_kafka_streaming_pipeline_spark.queries._shared import *  # noqa: F401,F403\n"
    )
    # walrus-defined names inside @register decorators (e.g.
    # ``oracle=(_X := ...)``) live in whichever family module hosts the
    # defining query; other modules that reuse the name import it
    walrus_def: dict[str, str] = {}
    module_files = []
    for fam in fam_order:
        blocks = by_fam[fam]
        chunks: list[list[str]] = [[]]
        count = 0
        for _name, t in blocks:
            n = t.count("\n")
            if count + n > MAX_LINES and chunks[-1]:
                chunks.append([])
                count = 0
            chunks[-1].append(t)
            count += n
        for ci, chunk in enumerate(chunks):
            mod = fam if ci == 0 else f"{fam}_{ci + 1}"
            module_files.append(mod)
            body = "".join("\n\n" + t.rstrip("\n") + "\n" for t in chunk)
            cross = "".join(
                f"from dea05_e2e_kafka_streaming_pipeline_spark.queries.{dm} import {n}  # noqa: F401,E501\n"
                for n, dm in walrus_def.items()
                if re.search(rf"\b{re.escape(n)}\b", body)
            )
            with open(os.path.join(OUT, f"{mod}.py"), "w") as f:
                f.write(
                    f'"""Registry queries: {fam} family'
                    + (f" (part {ci + 1})" if ci else "")
                    + '. Split from queries.py\n(r4 verdict item 2); '
                    'registration order within the family preserved.\n"""\n\n'
                )
                f.write(fam_header)
                f.write(cross)
                f.write(body)
            for m in re.finditer(r"\(\s*(\w+)\s*:=", body):
                walrus_def.setdefault(m.group(1), mod)

    # --- __init__.py
    with open(os.path.join(OUT, "__init__.py"), "w") as f:
        f.write(docstring.rstrip("\n") + "\n\n")
        f.write("from __future__ import annotations\n\n")
        f.write(
            "from dea05_e2e_kafka_streaming_pipeline_spark.queries._registry import (  # noqa: F401\n"
            "    QueryFn,\n    bench_queries,\n    oracles,\n"
            "    queries,\n    register,\n)\n\n"
        )
        f.write(
            "# family modules self-register on import; the order keeps the\n"
            "# original registry sequence (first query stays the bench warmup)\n"
        )
        for mod in module_files:
            f.write(
                f"from dea05_e2e_kafka_streaming_pipeline_spark.queries import {mod}  # noqa: F401,E402\n"
            )
        f.write(
            "\n# tests reach shared helpers (incl. underscore names) through\n"
            "# the package, exactly as they did through the old module\n"
            "from dea05_e2e_kafka_streaming_pipeline_spark.queries._shared import *  # noqa: F401,F403,E402\n"
        )

    os.remove(SRC)
    sizes = {
        m: sum(1 for _ in open(os.path.join(OUT, f"{m}.py")))
        for m in module_files + ["_shared", "_registry", "__init__"]
    }
    print(f"{len(query_parts)} queries -> {len(module_files)} family modules")
    for m, n in sorted(sizes.items(), key=lambda kv: -kv[1]):
        flag = "  <-- OVER" if n > 2500 else ""
        print(f"  {m}: {n} lines{flag}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
