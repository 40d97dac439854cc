"""The window-staging rule, enforced mechanically (VERDICT r7 item 2):
an operator whose implementing function or oracle changes after the
driver window was staged must occupy a leading window slot — otherwise
its driver-correctness evidence describes a plan that no longer exists.
tools/plan_hashes.json is the committed staging-time snapshot;
regenerate it with ``python tools/window_guard.py --update`` ONLY when
the changed entries are in the window."""

from __future__ import annotations

import importlib.util
import os

_GUARD = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "window_guard.py",
)


def _load_guard():
    spec = importlib.util.spec_from_file_location("window_guard", _GUARD)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_snapshot_exists_and_covers_registry():
    g = _load_guard()
    snap = g.load_snapshot()
    assert snap, "tools/plan_hashes.json missing — run window_guard.py --update"
    cur = g.current_hashes()
    # every registry entry must be snapshotted (new entries count as changed)
    assert len(cur) >= 126


def test_every_changed_entry_is_inside_the_staged_window():
    g = _load_guard()
    missing = g.unstaged_changes()
    assert not missing, (
        f"entries changed since the staged window without a leading slot: "
        f"{missing} — add them to __spark_entry__._CHECK_FIRST and re-run "
        f"tools/window_guard.py --update"
    )
