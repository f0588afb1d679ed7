"""Enforce the driver-window rotation policy STRUCTURALLY (VERDICT r4
"what's missing" #1: round 4 closed with an un-rotated head, and only
the judge noticed). The driver hash-checks the FIRST ~window queries()
entries per round, so after each new CORRECTNESS_r*.json lands the head
must be re-rotated or the next round re-proves green rows and drains
nothing. This test fails — with the fix spelled out — the moment the
committed order wastes window slots."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from rotation_report import CANARIES, rotation_state

WINDOW = 50


def test_head_window_honors_rotation_policy():
    st = rotation_state(WINDOW)
    head = set(st["queries"][:WINDOW])
    hint = (
        "run `python scripts/rotation_report.py` and reorder queries() "
        "in __spark_entry__.py to match its suggested head"
    )

    missing_canaries = [c for c in CANARIES if c not in head]
    assert not missing_canaries, (
        f"§2 canaries missing from the driver window: {missing_canaries} — {hint}"
    )

    missing_red = [q for q in st["red_unproven"] if q not in head]
    assert not missing_red, (
        f"fixed-but-never-re-proven queries missing from the driver "
        f"window: {missing_red} — {hint}"
    )

    # No already-green non-canary query may occupy a head slot while a
    # never-checked oracle-backed query waits outside the window.
    backlog_outside = [q for q in st["never"] if q not in head]
    wasted = [
        q
        for q in st["queries"][:WINDOW]
        if q in st["last_green"] and q not in CANARIES
    ]
    assert not (backlog_outside and wasted), (
        f"{len(wasted)} already-green non-canary queries occupy driver-"
        f"window slots (e.g. {wasted[:5]}) while {len(backlog_outside)} "
        f"never-checked oracles wait outside (e.g. {backlog_outside[:5]}) "
        f"— {hint}"
    )


def test_backlog_queues_immediately_behind_window():
    """The round-(N+1) drain must be staged: every never-checked
    oracle-backed query not in the current window sits in the next
    window-sized slice, so the following rotation is a pure reorder of
    already-adjacent entries."""
    st = rotation_state(WINDOW)
    next_slice = set(st["queries"][WINDOW : 2 * WINDOW])
    strays = [q for q in st["never"] if q not in set(st["queries"][:WINDOW]) | next_slice]
    assert not strays, (
        f"never-checked oracles parked beyond position {2 * WINDOW}: "
        f"{strays} — move them directly behind the driver window"
    )
