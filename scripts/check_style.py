#!/usr/bin/env python
"""Self-contained style/lint checker (the image ships no linters).

Checks, in the spirit of the reference's four-shard lint stack
(ref scripts/lint.sh: isort + flake8 + mypy --strict + pylint):

* every module, public class and public function in ``pyctcdecode_tpu/``
  has a docstring;
* no tab characters, no trailing whitespace;
* a hard line-length ceiling (120);
* no ``print(`` in library code (logging only; scripts exempt);
* unused imports (pyflakes F401 analog);
* public functions fully annotated — parameters and return
  (mypy ``strict`` disallow_untyped_defs analog);
* no bare ``except:`` (E722), no ``== None``/``!= None`` (E711),
  no mutable default arguments (pylint W0102);
* module-level imports grouped stdlib → third-party → local with each
  block alphabetized (isort analog).

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


_STDLIB = {
    "abc", "argparse", "array", "ast", "base64", "bisect", "collections",
    "contextlib", "copy", "csv", "ctypes", "datetime", "difflib", "enum",
    "gc", "getpass", "gzip", "inspect", "pickle", "platform", "pprint",
    "queue", "random", "secrets", "select", "shlex", "signal", "stat",
    "string", "textwrap", "threading", "traceback", "types", "unittest",
    "urllib", "uuid", "weakref",
    "dataclasses", "functools", "glob", "hashlib", "heapq", "importlib",
    "io", "itertools", "json", "logging", "math", "multiprocessing", "os",
    "pathlib", "re", "shutil", "socket", "struct", "subprocess", "sys",
    "tempfile", "time", "typing", "unicodedata", "warnings", "zlib",
}


def _import_block_kind(node: ast.stmt) -> str:
    """Classify a module-level import as stdlib / thirdparty / local."""
    if isinstance(node, ast.ImportFrom):
        if node.level > 0:
            return "local"
        top = (node.module or "").split(".")[0]
    else:
        top = node.names[0].name.split(".")[0]
    if top in _STDLIB:
        return "stdlib"
    if top == "pyctcdecode_tpu":
        return "local"
    return "thirdparty"


def _check_unused_imports(rel, tree: ast.Module, text: str) -> None:
    """pyflakes-F401 analog: names imported at module level, never read."""
    imported = {}  # name -> lineno
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for a in node.names:
                name = (a.asname or a.name).split(".")[0]
                imported[name] = node.lineno
        elif isinstance(node, ast.ImportFrom):
            if node.module == "__future__":
                continue
            for a in node.names:
                if a.name == "*":
                    continue
                imported[a.asname or a.name] = node.lineno
    if not imported:
        return
    used = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Name) and isinstance(node.ctx, ast.Load):
            used.add(node.id)
        elif isinstance(node, ast.Attribute):
            inner = node.value
            while isinstance(inner, ast.Attribute):
                inner = inner.value
            if isinstance(inner, ast.Name):
                used.add(inner.id)
    # names re-exported via __all__ or string annotations count as used
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            used.add(node.value)
    for name, lineno in sorted(imported.items()):
        if name not in used:
            errors.append(f"{rel}:{lineno}: unused import '{name}'")


def _check_annotations(rel, node) -> None:
    """mypy-strict analog: public functions carry full annotations."""
    args = node.args
    every = (
        list(args.posonlyargs) + list(args.args) + list(args.kwonlyargs)
    )
    missing = [
        a.arg
        for a in every
        if a.annotation is None and a.arg not in ("self", "cls")
    ]
    if args.vararg is not None and args.vararg.annotation is None:
        missing.append("*" + args.vararg.arg)
    if args.kwarg is not None and args.kwarg.annotation is None:
        missing.append("**" + args.kwarg.arg)
    if missing:
        errors.append(
            f"{rel}:{node.lineno}: public function '{node.name}' has "
            f"unannotated parameters: {', '.join(missing)}"
        )
    if node.returns is None and node.name != "__init__":
        errors.append(
            f"{rel}:{node.lineno}: public function '{node.name}' missing "
            "return annotation"
        )


def _check_import_order(rel, tree: ast.Module) -> None:
    """isort analog: stdlib -> third-party -> local, alphabetized blocks."""
    order = {"stdlib": 0, "thirdparty": 1, "local": 2}
    prev_kind = -1
    prev_name = ""
    for node in tree.body:
        if isinstance(node, ast.ImportFrom) and node.module == "__future__":
            continue
        if not isinstance(node, (ast.Import, ast.ImportFrom)):
            # any interleaved statement resets the ordering window
            prev_kind, prev_name = -1, ""
            continue
        kind = order[_import_block_kind(node)]
        if isinstance(node, ast.ImportFrom):
            name = "." * node.level + (node.module or "")
        else:
            name = node.names[0].name
        if kind < prev_kind:
            errors.append(
                f"{rel}:{node.lineno}: import '{name}' out of group order "
                "(stdlib -> third-party -> local)"
            )
        elif kind == prev_kind and name.lower() < prev_name.lower():
            errors.append(
                f"{rel}:{node.lineno}: import '{name}' not alphabetized "
                "within its group"
            )
        prev_kind, prev_name = kind, name


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
    _check_unused_imports(rel, tree, text)
    _check_import_order(rel, tree)
    # docstring/annotation rules apply to the public API surface only:
    # module-level and class-body defs (nested helpers are implementation)
    api_defs = []
    for node in tree.body:
        if isinstance(node, (ast.ClassDef, ast.FunctionDef, ast.AsyncFunctionDef)):
            api_defs.append(node)
            if isinstance(node, ast.ClassDef):
                api_defs.extend(
                    n
                    for n in node.body
                    if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
                )
    for node in api_defs:
        if node.name.startswith("_"):
            continue
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            _check_annotations(rel, node)
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
    for node in ast.walk(tree):
        if isinstance(node, ast.Call) and isinstance(node.func, ast.Name):
            if node.func.id == "print":
                errors.append(f"{rel}:{node.lineno}: print() in library code")
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            errors.append(f"{rel}:{node.lineno}: bare 'except:' (E722)")
        if isinstance(node, ast.Compare):
            for op, cmp in zip(node.ops, node.comparators):
                if isinstance(op, (ast.Eq, ast.NotEq)) and (
                    isinstance(cmp, ast.Constant) and cmp.value is None
                ):
                    errors.append(
                        f"{rel}:{node.lineno}: comparison to None with "
                        "==/!= (E711); use 'is'"
                    )
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for default in list(node.args.defaults) + [
                d for d in node.args.kw_defaults if d is not None
            ]:
                if isinstance(default, (ast.List, ast.Dict, ast.Set)):
                    errors.append(
                        f"{rel}:{node.lineno}: mutable default argument in "
                        f"'{node.name}' (W0102)"
                    )


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
