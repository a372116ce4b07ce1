"""The driver-window plan: generated, not hand-picked (VERDICT r9
"Next round" item 2). ``plans.all_queries()``'s yield order must
follow ``window_plan.planned_order`` over the real CORRECTNESS ledger,
and the ordering policy itself is pinned on synthetic histories."""

from __future__ import annotations

import json

from sm_etl_cloud_run_spark import plans
from sm_etl_cloud_run_spark.plans.window_plan import (
    FORCE_RECHECK,
    WINDOW_SIZE,
    last_green,
    planned_order,
    repo_root,
)


def test_all_queries_follows_the_plan():
    names = list(plans.all_queries())
    greens = last_green()
    # registration order = _REGISTRY insertion order, which planned_order
    # receives; reconstruct it from the registry directly
    from sm_etl_cloud_run_spark.plans.registry import _REGISTRY

    assert names == planned_order(list(_REGISTRY), greens)
    assert len(names) == len(set(names)) == len(_REGISTRY)


def test_window_is_stale_first():
    """No query outside the window may be staler than one inside it
    (never-checked and force-recheck rows excluded — they lead by
    policy, not by age)."""
    names = list(plans.all_queries())
    greens = last_green()
    window, rest = names[:WINDOW_SIZE], names[WINDOW_SIZE:]
    plain = [greens[n] for n in window if n in greens and n not in FORCE_RECHECK]
    if rest and plain:
        assert max(plain) <= min(greens.get(n, 0) for n in rest)


def test_window_leads_with_never_checked_then_forced():
    greens = last_green()
    names = list(plans.all_queries())
    seen_aged = False
    for n in names:
        aged = n in greens and n not in FORCE_RECHECK
        if aged:
            seen_aged = True
        else:
            # a never-checked or forced row after an aged row would mean
            # it can be pushed out of the window by mere registry growth
            assert not seen_aged, n


def test_ledger_parser_counts_only_green_rows(tmp_path):
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "a": {"hash_match": True, "err": None},
        "b": {"hash_match": False, "err": None},
        "c": {"hash_match": None, "err": "no_oracle", "spark_rows": 5},
        "d": {"hash_match": None, "err": "boom", "spark_rows": None},
    }))
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({
        "b": {"hash_match": True, "err": None},
        "a": {"hash_match": True, "err": None},
    }))
    g = last_green(tmp_path)
    assert g == {"a": 3, "b": 3, "c": 1}  # d never green; a takes max


def test_planned_order_policy_on_synthetic_history():
    registered = ["q1", "q2", "q3", "q4", "q5", "q6"]
    greens = {"q1": 5, "q2": 1, "q4": 3, "q5": 1, "q6": 2}
    # q3 never checked -> first; q4 forced -> second; then stale-first
    # (q2, q5 at r1 in registration order, q6 at r2, q1 at r5)
    got = planned_order(registered, greens, force_recheck=("q4", "zz"))
    assert got == ["q3", "q4", "q2", "q5", "q6", "q1"]


def test_round10_window_covers_the_r1r2_backlog():
    """VERDICT r9 item 1: the r10 window must contain every query whose
    newest driver-green row is r1/r2-age. Computed from the live
    ledger, so this self-retires once those rows re-green."""
    greens = last_green()
    oldest = min(greens.values(), default=0)
    stalest = {n for n, r in greens.items() if r <= oldest}
    window = set(list(plans.all_queries())[:WINDOW_SIZE])
    missing = stalest - window
    assert not missing or len(stalest) > WINDOW_SIZE, missing


def test_ledger_exists_at_repo_root():
    assert list(repo_root().glob("CORRECTNESS_r*.json")), repo_root()
