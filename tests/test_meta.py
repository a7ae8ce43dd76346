"""Meta-guards over the test suite and source package themselves.

Round 7 found a silently-skipped fuzzer: two module-level functions
named test_random_join_spec_parity — Python keeps only the last
definition, pytest collected one, and the first never ran while
looking fully present in the file. This guard makes that defect class
impossible to reintroduce anywhere."""

from __future__ import annotations

import ast
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _module_level_dups(path: pathlib.Path) -> set[str]:
    tree = ast.parse(path.read_text())
    names = [
        n.name
        for n in tree.body
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef))
    ]
    return {n for n in names if names.count(n) > 1}


def test_no_shadowed_module_level_definitions():
    bad = {}
    for sub in ("tests", "sql_engine_triangle_spark", "scripts"):
        for p in (ROOT / sub).rglob("*.py"):
            dups = _module_level_dups(p)
            if dups:
                bad[str(p.relative_to(ROOT))] = sorted(dups)
    assert not bad, f"module-level name shadowing (later def wins): {bad}"
