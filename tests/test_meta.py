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


def test_priority_window_contract():
    """The driver ingests the FIRST 50 queries() entries — pin the
    window invariants in CI, not just as a runtime warn: exactly 50
    unique names, every one registered AND oracle-backed (a rows-only
    entry in the window wastes an external hash-check slot), and
    all_queries() actually leads with them in order."""
    from sql_engine_triangle_spark.queries import registry

    w = registry._PRIORITY_WINDOW
    assert len(w) == 50
    assert len(set(w)) == 50
    oracles = registry.all_oracles()
    missing = [n for n in w if n not in oracles]
    assert not missing, f"rows-only entries inside the driver window: {missing}"
    assert list(registry.all_queries())[:50] == list(w)
