"""Guard against silent shadowing: within any module of the package, a
top-level function or class defined twice means the second silently
replaces the first (exactly how an appended hll_registers once disabled
three graded sketch queries).  Registry-level name collisions are
guarded in queries/__init__.py::register; this covers the module level."""

from __future__ import annotations

import ast
import collections
import glob
import os

PKG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "my_flink_1_10_2_spark")


def test_no_duplicate_toplevel_defs():
    offenders = {}
    for path in glob.glob(os.path.join(PKG, "**", "*.py"), recursive=True):
        tree = ast.parse(open(path).read())
        names = collections.Counter(
            n.name
            for n in tree.body
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef))
        )
        dups = [n for n, c in names.items() if c > 1]
        if dups:
            offenders[os.path.relpath(path, PKG)] = dups
    assert not offenders, f"shadowed top-level defs: {offenders}"
