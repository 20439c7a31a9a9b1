"""Entry-file lint: duplicate symbol definitions and duplicate dict keys.

VERDICT r4 item 3: a second ``def _q_stay_points`` silently shadowed the
first, dropping the grid stay-point query from the certified surface, and
``queries()`` carried the same dict key twice (last wins, first vanished).
This lint makes both failure modes a hard gate error:

  * F811-style: any module-level ``def``/``class`` name bound more than
    once in ``__spark_entry__.py``.
  * Duplicate literal keys in any dict literal (covers the ``queries()``
    and ``oracle_sql()`` return dicts).

Usage: python3 scripts/lint_entry.py [path ...]   (default __spark_entry__.py)
Exit 0 = clean, 1 = violations printed.
"""

from __future__ import annotations

import ast
import os
import sys
from collections import Counter


def lint_file(path: str) -> list[str]:
    src = open(path).read()
    tree = ast.parse(src, filename=path)
    errors: list[str] = []

    # Module-level redefinitions (def/class only; plain assignments of the
    # same name, e.g. conditional fallbacks, are allowed).
    seen: dict[str, int] = {}
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            if node.name in seen:
                errors.append(
                    f"{path}:{node.lineno}: F811 redefinition of "
                    f"'{node.name}' (first defined at line {seen[node.name]})"
                )
            else:
                seen[node.name] = node.lineno

    # Duplicate literal keys in dict literals anywhere in the file.
    for node in ast.walk(tree):
        if isinstance(node, ast.Dict):
            keys = [
                k.value
                for k in node.keys
                if isinstance(k, ast.Constant) and isinstance(k.value, (str, int))
            ]
            for key, n in Counter(keys).items():
                if n > 1:
                    errors.append(
                        f"{path}:{node.lineno}: duplicate dict key "
                        f"{key!r} appears {n} times"
                    )
    return errors


def main() -> int:
    default = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "__spark_entry__.py",
    )
    paths = sys.argv[1:] or [default]
    errors: list[str] = []
    for p in paths:
        errors.extend(lint_file(p))
    for e in errors:
        print(e)
    print(f"lint_entry: {len(errors)} violation(s) in {len(paths)} file(s)")
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
