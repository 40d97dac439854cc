"""Mechanical enforcement of the driver-window staging rule (VERDICT r7
item 2): every registry entry whose implementing function (or oracle
SQL) changed since the last staged check window MUST hold a leading
slot in ``__spark_entry__._CHECK_FIRST`` — otherwise its driver
evidence predates its current plan, the exact miss round 7 shipped
(d_embedding_neardup_lsh / d_ngram_jaccard_pairs were rewritten after
the window was staged).

Protocol:
- ``python tools/window_guard.py --update`` regenerates the committed
  snapshot ``tools/plan_hashes.json``. Run it ONLY when (re)staging the
  window — the snapshot means "these sources are what the staged window
  covers".
- ``python tools/window_guard.py`` (and tests/test_window_guard.py,
  which runs in every pytest pass) lists entries whose current hash
  differs from the snapshot and fails unless each one sits inside the
  window (the first 50 names of the final queries() ordering).

Granularity (hardened in r9, VERDICT r8 item 6): the hash covers the
entry's own function source, its oracle string, AND the sources of its
TRANSITIVE in-package callees — module-level names it references,
``from dbt_fal_spark...`` imports inside its body, and attribute calls
on in-package modules. Editing a SHARED helper (functions/rank.py,
_minhash_sig, ...) therefore flips every calling entry's hash; no
manual stage-the-callers step remains. Out-of-package calls (pyspark,
stdlib) are deliberately excluded — their churn is not a plan change.
"""

from __future__ import annotations

import argparse
import ast
import hashlib
import importlib
import inspect
import json
import os
import sys
import textwrap
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SNAPSHOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plan_hashes.json")
WINDOW = 50  # the driver records exactly the first 50 queries() entries
PKG = "dbt_fal_spark"

_callee_cache: dict[tuple[str, str], list] = {}


def _in_pkg(obj) -> bool:
    return getattr(obj, "__module__", "").startswith(PKG) and isinstance(
        obj, (types.FunctionType, type)
    )


def _callees(fn) -> list:
    """fn's directly-referenced in-package functions/classes: globals it
    names, ``from dbt_fal_spark.x import y`` bindings inside its body,
    and ``mod.attr`` access on in-package modules."""
    key = (getattr(fn, "__module__", ""), getattr(fn, "__qualname__", repr(fn)))
    if key in _callee_cache:
        return _callee_cache[key]
    out: list = []
    _callee_cache[key] = out  # pre-seed: cycles terminate
    try:
        tree = ast.parse(textwrap.dedent(inspect.getsource(fn)))
    except (OSError, TypeError, SyntaxError):
        return out
    g = getattr(fn, "__globals__", {})
    local: dict[str, object] = {}  # names bound by imports inside the body
    names: set[str] = set()
    attrs: set[tuple[str, str]] = set()  # (base name, attribute)
    for node in ast.walk(tree):
        if isinstance(node, ast.Name):
            names.add(node.id)
        elif isinstance(node, ast.Attribute) and isinstance(node.value, ast.Name):
            attrs.add((node.value.id, node.attr))
        elif isinstance(node, ast.ImportFrom) and node.module and node.module.startswith(PKG):
            try:
                mod = importlib.import_module(node.module)
            except ImportError:
                continue
            for alias in node.names:
                obj = getattr(mod, alias.name, None)
                if obj is not None:
                    local[alias.asname or alias.name] = obj
        elif isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.startswith(PKG):
                    try:
                        local[alias.asname or alias.name] = importlib.import_module(alias.name)
                    except ImportError:
                        pass
    seen_ids = set()

    def _add(obj):
        if _in_pkg(obj) and id(obj) not in seen_ids:
            seen_ids.add(id(obj))
            out.append(obj)

    for n in sorted(names):
        _add(local.get(n, g.get(n)))
    for base, attr in sorted(attrs):
        holder = local.get(base, g.get(base))
        if isinstance(holder, types.ModuleType) and holder.__name__.startswith(PKG):
            _add(getattr(holder, attr, None))
    return out


def closure_sources(fn) -> list[tuple[str, str]]:
    """Deterministic [(qualified name, source)] for fn's transitive
    in-package callee closure (fn itself excluded)."""
    seen: set[tuple[str, str]] = set()
    stack = list(_callees(fn))
    found = []
    while stack:
        f = stack.pop()
        key = (getattr(f, "__module__", ""), getattr(f, "__qualname__", repr(f)))
        if key in seen:
            continue
        seen.add(key)
        found.append((f"{key[0]}.{key[1]}", f))
        stack.extend(_callees(f))
    srcs = []
    for qual, f in sorted(found, key=lambda t: t[0]):
        try:
            srcs.append((qual, textwrap.dedent(inspect.getsource(f))))
        except (OSError, TypeError):
            srcs.append((qual, "<source unavailable>"))
    return srcs


def closure_hash(fn, oracle: str | None) -> str:
    h = hashlib.sha256()
    try:
        h.update(inspect.getsource(fn).encode())
    except (OSError, TypeError):
        h.update(b"<source unavailable>")
    h.update(b"\x1f")
    h.update((oracle or "").encode())
    for qual, src in closure_sources(fn):
        h.update(b"\x1e")
        h.update(qual.encode())
        h.update(b"\x1f")
        h.update(src.encode())
    return h.hexdigest()


def current_hashes() -> dict[str, str]:
    from dbt_fal_spark.registry import all_queries

    return {
        name: closure_hash(spec.fn, spec.oracle)
        for name, spec in all_queries().items()
    }


def load_snapshot() -> dict[str, str]:
    try:
        with open(SNAPSHOT) as f:
            return json.load(f)
    except OSError:
        return {}


def changed_entries() -> list[str]:
    """Entries whose closure hash differs from the committed snapshot
    (including entries new since the snapshot)."""
    snap = load_snapshot()
    return sorted(n for n, h in current_hashes().items() if snap.get(n) != h)


def window_names() -> list[str]:
    """The first WINDOW names of the driver's actual check order."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry_for_guard__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return list(mod.queries())[:WINDOW]


def unstaged_changes() -> list[str]:
    win = set(window_names())
    return [n for n in changed_entries() if n not in win]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--update", action="store_true",
        help="re-snapshot plan_hashes.json (only at window staging time)",
    )
    args = ap.parse_args()
    if args.update:
        with open(SNAPSHOT, "w") as f:
            json.dump(current_hashes(), f, indent=0, sort_keys=True)
            f.write("\n")
        print(f"snapshot written: {SNAPSHOT}")
        return 0
    changed = changed_entries()
    missing = unstaged_changes()
    print(f"changed since snapshot: {len(changed)}")
    for n in changed:
        mark = "UNSTAGED" if n in missing else "windowed"
        print(f"  {mark}  {n}")
    if missing:
        print(
            "\nFAIL: the above UNSTAGED entries changed without a slot in the "
            "first 50 of queries() — add them to __spark_entry__._CHECK_FIRST, "
            "then re-run tools/window_guard.py --update"
        )
        return 1
    print("OK: every changed entry is inside the staged window")
    return 0


if __name__ == "__main__":
    sys.exit(main())
