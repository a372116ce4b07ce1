"""Driver-window planning: compute the query yield order from the
CORRECTNESS_r*.json ledger instead of hand-maintained tier tuples.

The driver's CORRECTNESS gate checks exactly the FIRST
``WINDOW_SIZE`` queries that ``plans.all_queries()`` yields, so the
yield order IS the freshness policy for the driver's own ledger. Up
to round 9 the policy lived in two hand-edited tuples in
``registry.py`` ("tier 1 / tier 2"); round 9 ran AT window capacity
and one more hand edit away from a new query silently missing its own
driver check (VERDICT r9 "Next round" item 2). This module replaces
the hand edit with a computed plan:

1. **never-checked** queries first (no green row in any
   CORRECTNESS_r*.json) — a newly registered query must be in its
   first window, in registration order;
2. **force-recheck** next (:data:`FORCE_RECHECK`, the one remaining
   hand-maintained input: queries whose IMPLEMENTATION changed since
   their last green row — change detection cannot be derived from the
   ledger);
3. everything else **stale-first**: ascending last-green round, ties
   in registration order.

A row counts as green in round N when its CORRECTNESS row has
``hash_match: true``, or — for the declared rows-only sketch queries
(``__spark_entry__.rows_only_queries``) — when the driver's weaker
rows-only check ran (``err: "no_oracle"`` with a row count).

The plan is deterministic given (ledger files, registry order,
FORCE_RECHECK), so steady state needs no human input at all: each
round's new CORRECTNESS file rotates the window to the 50 oldest rows
automatically, cycling the whole registry every
``ceil(len(registry) / 50)`` rounds. ``tools/window_plan.py`` prints
the current plan and the multi-round rotation forecast;
``tests/test_window_plan.py`` pins the ordering properties and that
``plans.all_queries()`` actually follows the plan.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

# The driver checks the first 50 yielded queries (observed: every
# CORRECTNESS_r*.json has exactly 50 rows).
WINDOW_SIZE = 50

# Hand-maintained: queries whose implementation changed since their
# last driver-green row. Emptied each round once the change is green.
# Round 13 start: all 17 round-12 forced rows landed hash-green in
# CORRECTNESS_r12 (verified row-by-row), so they were removed per this
# tuple's convention — the generated window rotates the r5 backlog.
# Entries added below as round-13 optimization work touches
# expression trees.
FORCE_RECHECK: tuple[str, ...] = (
    # VERDICT r12 "What's wrong" #2: this bitset-construction rewrite
    # (3-way unionAll → persisted keys + inline explode, r12 commit
    # 5fe8aa8) was misclassified as a pure persist addition and skipped
    # the r12 recheck; its last driver-green row is round 7. Forced now
    # so CORRECTNESS_r13 re-greens the current tree. (Audit of the
    # other r12 persist-only classifications — doremi/dsir/bm25/
    # domain_rollup/bm25's rrf consumer — confirmed those really are
    # bare persist_tracked() wraps with unchanged expression trees.)
    "join_bloom_prefilter",
    # r13 optimization rewrites whose EXPRESSION TREE changed
    # (parity-verified 0-diff at both SFs in-session):
    "events_dedup_state_census",      # chain rounds → per-key sorted fold
    "events_stream_state_census",     # fused peak-of-prefix-sum sweep
    "events_watermark_tradeoff",      # consumes state_census's fused sweep
    "quality_classifier_train",       # doc-vector numpy sufficient stats
    "quality_classifier_train_auc",   # shares _qt_fit's rewritten passes
    "q2_min_cost_supplier",           # part-filter semi-join prefilter
    "knn_brute_force",                # Arrow const-query cosine twin
    "knn_graph_brute",                # Arrow pair cosine twin (knn_join_topk)
    "knn_graph_lsh",                  # Arrow bucket/norm/cosine twins
    "pq_codebook_train",              # Arrow assign+partial-sum pass
    "j1_period_range_join",           # period dim from the shared date pass
    "text_winnowing_fingerprints",    # least(element_at) window minima
    "text_winnowing_overlap_pairs",   # consumes the same operator
)

_ROUND_RE = re.compile(r"CORRECTNESS_r(\d+)\.json$")


def repo_root() -> Path:
    """The ledger lives next to ``__spark_entry__.py`` — two levels up
    from this package module."""
    return Path(__file__).resolve().parents[2]


def last_green(history_dir: Path | None = None) -> dict[str, int]:
    """name → newest round with a green driver row for that query.

    Green = ``hash_match`` true, or the declared rows-only check
    (``err == "no_oracle"`` with a non-null spark row count). A failed
    or errored row never counts.
    """
    root = history_dir if history_dir is not None else repo_root()
    out: dict[str, int] = {}
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = _ROUND_RE.search(path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            green = row.get("hash_match") is True or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if green:
                out[name] = max(rnd, out.get(name, 0))
    return out


def planned_order(
    registered: list[str],
    greens: dict[str, int] | None = None,
    force_recheck: tuple[str, ...] = FORCE_RECHECK,
) -> list[str]:
    """The full yield order for ``registered`` (registration order),
    per the policy in the module docstring. Total: every registered
    name appears exactly once; unregistered force-recheck names are
    ignored."""
    if greens is None:
        greens = last_green()
    reg_pos = {name: i for i, name in enumerate(registered)}
    forced = {n for n in force_recheck if n in reg_pos}

    def key(name: str) -> tuple[int, int, int]:
        if name not in greens:
            tier = 0
        elif name in forced:
            tier = 1
        else:
            tier = 2
        return (tier, greens.get(name, 0), reg_pos[name])

    return sorted(registered, key=key)
