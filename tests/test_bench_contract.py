"""Pin bench.py's coverage contract.

VERDICT r12 'What's wrong' 1 was bench drift: BASELINE.md claimed four
entries were in the composite while bench.py's HEADLINE/sweep never
timed them. These tests make that class of drift a red test instead of
a judge finding: every oracled registry entry must earn wall-time
evidence either per-round (composite set) or via the rotating slice,
and the rotation must provably cycle through its whole pool.
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dbt_fal_spark.registry import all_queries  # noqa: E402


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _composite_names(bench, specs):
    """Reproduce main()'s composite-set construction (HEADLINE + the
    prefix sweep, minus the documented skips)."""
    names = [n for n in bench.HEADLINE if n in specs]
    skip = {"t_pack_sequences", "t_pack_emit"}
    for name in sorted(specs):
        if (
            name not in names
            and name not in skip
            and specs[name].oracle is not None
            and any(name.startswith(p) for p in ("d_", "s_", "t_", "e_", "m_"))
        ):
            names.append(name)
    return names, skip


def test_headline_entries_exist_and_are_oracled():
    bench = _load_bench()
    specs = all_queries()
    missing = [n for n in bench.HEADLINE if n not in specs]
    assert not missing, f"HEADLINE names absent from the registry: {missing}"
    # composite ratios pair engine vs oracle — an oracle-less HEADLINE
    # entry would silently drop from the paired totals
    unoracled = [n for n in bench.HEADLINE if specs[n].oracle is None]
    assert not unoracled, f"HEADLINE entries without oracles: {unoracled}"


def test_every_oracled_entry_earns_timing_evidence():
    """composite set ∪ rotation pool ∪ documented skips == all oracled
    entries — nothing can silently fall outside wall-time coverage."""
    bench = _load_bench()
    specs = all_queries()
    composite, skip = _composite_names(bench, specs)
    rotate_pool = sorted(
        n
        for n in specs
        if n not in composite and n not in skip and specs[n].oracle is not None
    )
    covered = set(composite) | set(rotate_pool) | skip
    oracled = {n for n in specs if specs[n].oracle is not None}
    uncovered = oracled - covered
    assert not uncovered, f"oracled entries with no timing evidence path: {uncovered}"
    # and the two sets are disjoint: an entry timed in the composite must
    # not also consume a rotation slot
    assert not (set(composite) & set(rotate_pool))


def test_rotation_cycles_through_entire_pool():
    """Consecutive rounds' slices must cover the whole pool within
    ceil(len(pool)/ROTATE_N) rounds — the deterministic advance can't
    skip entries."""
    bench = _load_bench()
    specs = all_queries()
    composite, skip = _composite_names(bench, specs)
    pool = sorted(
        n
        for n in specs
        if n not in composite and n not in skip and specs[n].oracle is not None
    )
    if not pool:
        return
    n = bench.ROTATE_N
    rounds_needed = -(-len(pool) // n) + 1  # ceil + 1 for wraparound
    seen: set[str] = set()
    for rnd in range(13, 13 + rounds_needed):
        start = (rnd * n) % len(pool)
        doubled = pool + pool
        seen.update(doubled[start : start + min(n, len(pool))])
    assert seen == set(pool), f"rotation never reaches: {set(pool) - seen}"


def test_oracle_bench_shares_bench_headline():
    """tools/oracle_bench.py must time the SAME headline set as
    bench.py — it drifted in r13 (a stale HEADLINE copy missing the
    four r12 TPC-H entries); it now imports bench.HEADLINE, which this
    test pins."""
    bench = _load_bench()
    spec = importlib.util.spec_from_file_location(
        "oracle_bench_under_test", os.path.join(REPO, "tools", "oracle_bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.HEADLINE == bench.HEADLINE


def test_skips_are_still_oracle_checked():
    """The bench skip set opts entries out of TIMING pairing only —
    they must still carry oracles so the correctness gate covers them."""
    specs = all_queries()
    for name in ("t_pack_sequences", "t_pack_emit"):
        assert name in specs and specs[name].oracle is not None
