"""Driver-window rotation report (VERDICT r3 #10): the driver
hash-checks the FIRST ~50 ``queries()`` entries each round, so registry
ORDER is the verification-rotation policy. This reports, from the
accumulated CORRECTNESS_r*.json artifacts, each registry query's
last driver-checked round and suggests the next round's head:

    1. fixed-but-never-re-proven queries (red once, never green since),
    2. the 6 permanent §2 reference-parity canaries,
    3. every registry query the driver has NEVER checked — oracle-backed
       (rows+schema+hash) AND rows-only (rows_match is the weaker but
       still real driver signal; VERDICT r6 #1 — the 13 rows-only
       entries had never received ANY driver CORRECTNESS row because
       earlier windows held only oracle-backed queries),
    4. the stalest-checked remainder (oldest green round first),

so the backlog drains monotonically and every query re-verifies at
least every ceil(registry / window) rounds. Usage:

    python scripts/rotation_report.py [window_size]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CANARIES = [
    "with_timeindex",
    "reportdata_series",
    "to_units_kelvin",
    "ldc",
    "series_align_arithmetic",
    # VERDICT r4 #9: the only §2 oracle not re-proven since r2 —
    # promoted to permanent canary so it re-proves every round.
    "reportdata_pivot",
]


def rotation_state(window: int = 50) -> dict:
    """Compute the rotation bookkeeping from the accumulated
    CORRECTNESS artifacts. Shared by the report CLI and the
    head-ordering enforcement test (tests/test_rotation.py), so the
    policy and its check cannot drift."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    import __spark_entry__ as entrymod

    queries = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())

    last_green: dict[str, int] = {}
    last_red: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int("".join(c for c in os.path.basename(path) if c.isdigit()))
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            if row.get("hash_match") or (
                name not in oracles and row.get("rows_match")
            ):
                last_green[name] = max(last_green.get(name, 0), rnd)
            else:
                last_red[name] = max(last_red.get(name, 0), rnd)

    oracle_backed = [q for q in queries if q in oracles]
    # r8 policy fix (VERDICT r7 #2 and "what's wrong" #3, reversing the
    # r7 extension): the PRODUCTION driver has no rows-only check path —
    # all 13 non-oracle queries headed in the r7 window came back
    # err=no_oracle / rows_match=null, producing ZERO driver evidence
    # and wasting 13 of 50 slots. Window slots therefore go to
    # oracle-backed queries only; rows-only queries keep their
    # local-suite correctness pin (SURVEY §8) and never occupy a
    # driver slot.
    never = [q for q in oracle_backed if q not in last_green]
    stale = sorted(
        (q for q in oracle_backed if q in last_green),
        key=lambda q: (last_green[q], queries.index(q)),
    )
    red_unproven = [
        q for q in never if q in last_red
    ]  # red once, fixed, never re-proven — highest priority
    head = list(
        dict.fromkeys(
            red_unproven
            + CANARIES
            + [q for q in never if q not in red_unproven]
            + stale
        )
    )[:window]
    return {
        "window": window,
        "queries": queries,
        "oracle_backed": oracle_backed,
        "last_green": last_green,
        "never": never,
        "stale": stale,
        "red_unproven": red_unproven,
        "head": head,
    }


def main() -> None:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    st = rotation_state(window)
    queries = st["queries"]
    oracle_backed = st["oracle_backed"]
    last_green = st["last_green"]
    never = st["never"]
    red_unproven = st["red_unproven"]

    print(f"registry: {len(queries)} queries / {len(oracle_backed)} oracles")
    print(f"driver-checked at least once: {len(last_green)}")
    print(f"never checked: {len(never)} (backlog; window={window})")
    if red_unproven:
        print(f"RED-but-unproven fixes (head these): {red_unproven}")

    head = st["head"]
    print("\nsuggested next-round head (reorder queries() to match):")
    for i, q in enumerate(head, 1):
        tag = (
            "RED-UNPROVEN"
            if q in red_unproven
            else "canary"
            if q in CANARIES
            else "never"
            if q in never
            else f"green r{last_green[q]}"
        )
        print(f"  {i:3d}. {q}  [{tag}]")


if __name__ == "__main__":
    main()
