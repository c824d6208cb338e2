#!/usr/bin/env python
"""Minimal self-contained style checker (the image ships no linters).

Checks, in the spirit of the reference's lint stack (ref scripts/lint.sh):

* every module, public class and public function in ``pyctcdecode_tpu/``
  has a docstring;
* no tab characters, no trailing whitespace;
* a hard line-length ceiling (120);
* no ``print(`` in library code (logging only; scripts exempt).

Exits non-zero with a findings list on violation.
"""
from __future__ import annotations

import ast
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PKG = ROOT / "pyctcdecode_tpu"
MAX_LINE = 120

errors = []


def check_file(path: Path) -> None:
    rel = path.relative_to(ROOT)
    text = path.read_text()
    for i, line in enumerate(text.splitlines(), start=1):
        if "\t" in line:
            errors.append(f"{rel}:{i}: tab character")
        if line != line.rstrip():
            errors.append(f"{rel}:{i}: trailing whitespace")
        if len(line) > MAX_LINE:
            errors.append(f"{rel}:{i}: line longer than {MAX_LINE} chars")
    try:
        tree = ast.parse(text)
    except SyntaxError as err:
        errors.append(f"{rel}: syntax error: {err}")
        return
    if not ast.get_docstring(tree):
        errors.append(f"{rel}:1: missing module docstring")
    for node in ast.walk(tree):
        if isinstance(node, (ast.ClassDef, ast.FunctionDef, ast.AsyncFunctionDef)):
            if node.name.startswith("_"):
                continue
            if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                # trivial accessors and property getters are self-describing
                if len(node.body) <= 1:
                    continue
                deco = {
                    d.id if isinstance(d, ast.Name) else getattr(d, "attr", "")
                    for d in node.decorator_list
                }
                if "property" in deco or "classmethod" in deco and len(node.body) <= 2:
                    continue
            if not ast.get_docstring(node):
                errors.append(
                    f"{rel}:{node.lineno}: public {type(node).__name__.lower()} "
                    f"'{node.name}' missing docstring"
                )
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Name):
            if node.func.id == "print":
                errors.append(f"{rel}:{node.lineno}: print() in library code")


def main() -> int:
    for path in sorted(PKG.rglob("*.py")):
        check_file(path)
    for err in errors:
        sys.stdout.write(err + "\n")
    if errors:
        sys.stdout.write(f"FAILED: {len(errors)} style errors\n")
        return 1
    sys.stdout.write("style: OK\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
