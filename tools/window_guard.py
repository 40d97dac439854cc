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

Granularity: the hash covers the entry's own function source plus its
oracle string. An edit to a SHARED helper (e.g. _minhash_sig) does not
flip callers' hashes — when touching a shared helper, stage its callers
manually (the helper's docstring lists them) or re-run --update only
after adding them to the window.
"""

from __future__ import annotations

import argparse
import hashlib
import inspect
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SNAPSHOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plan_hashes.json")
WINDOW = 50  # the driver records exactly the first 50 queries() entries


def current_hashes() -> dict[str, str]:
    from dbt_fal_spark.registry import all_queries

    out = {}
    for name, spec in all_queries().items():
        h = hashlib.sha256()
        try:
            h.update(inspect.getsource(spec.fn).encode())
        except (OSError, TypeError):
            h.update(b"<source unavailable>")
        h.update(b"\x1f")
        h.update((spec.oracle or "").encode())
        out[name] = h.hexdigest()
    return out


def load_snapshot() -> dict[str, str]:
    try:
        with open(SNAPSHOT) as f:
            return json.load(f)
    except OSError:
        return {}


def changed_entries() -> list[str]:
    """Entries whose function-source+oracle hash differs from the
    committed snapshot (including entries new since the snapshot)."""
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
