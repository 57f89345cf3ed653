"""Static integrity checks on the driver-contract module: duplicate
dict keys in ``queries()`` / ``oracle_sql()`` are silently shadowed by
Python (last wins), which once re-pointed an existing query at the
wrong implementation — parse the AST and forbid them outright."""

from __future__ import annotations

import ast
from collections import Counter
from pathlib import Path

ENTRY = Path(__file__).resolve().parent.parent / "__ray_entry__.py"


def _literal_dict_keys(func_name: str) -> list[str]:
    tree = ast.parse(ENTRY.read_text())
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == func_name:
            keys: list[str] = []
            for sub in ast.walk(node):
                if isinstance(sub, ast.Dict):
                    for k in sub.keys:
                        if isinstance(k, ast.Constant) and isinstance(
                            k.value, str
                        ):
                            keys.append(k.value)
            return keys
    raise AssertionError(f"{func_name} not found in __ray_entry__.py")


def test_no_duplicate_query_keys():
    dupes = {
        k: n for k, n in Counter(_literal_dict_keys("queries")).items()
        if n > 1
    }
    assert not dupes, f"shadowed queries() keys: {dupes}"


def test_no_duplicate_oracle_keys():
    dupes = {
        k: n for k, n in Counter(_literal_dict_keys("oracle_sql")).items()
        if n > 1
    }
    assert not dupes, f"shadowed oracle_sql() keys: {dupes}"


def test_no_orphan_oracles_and_every_query_callable():
    import __ray_entry__ as e

    qs, oq = e.queries(), e.oracle_sql()
    orphans = set(oq) - set(qs)
    assert not orphans, f"oracles without queries: {orphans}"
    assert all(callable(f) for f in qs.values())
    # each query function is used at most once: a def shadowed by a
    # later same-name def would make two keys share one callable
    ids = Counter(id(f) for f in qs.values())
    shared = {
        name: id(f) for name, f in qs.items() if ids[id(f)] > 1
    }
    assert not shared, f"queries sharing one callable: {shared}"
