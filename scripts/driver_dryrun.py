"""Dry-run the driver's correctness gate: run the FIRST N queries()
entries (the driver hash-checks ~50 per round) against their DuckDB
oracles at sf0.01 — the driver's scale — and report per-query
row/column/value agreement. Usage:

    python scripts/driver_dryrun.py [N] [sf_dir] [oracle_timeout_s]

``oracle_timeout_s`` (default none) interrupts a DuckDB oracle that
exceeds the budget and records the query as oracle-timeout instead of
failing the sweep — for above-driver-scale runs (sf0.1+), where the
deliberately-quadratic brute-force pair oracles (exactness references,
sized for sf0.01) would grind for hours while every tractable oracle
still value-checks.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tests.oracle_compare import compare_to_oracle, ddb_connect


def _execute_with_timeout(con, sql: str, seconds: float | None):
    """Run the oracle, interrupting DuckDB if it exceeds the budget."""
    if not seconds:
        return con.execute(sql)
    import threading

    import duckdb

    # Two layers of defense against the completion/timeout race
    # (ADVICE r4): the watchdog re-checks done right before
    # interrupting, and — because an interrupt can still land on an
    # idle connection in the window between execute() returning and
    # done.set(), leaving a pending cancel flag that kills the NEXT
    # oracle — an InterruptException whose OWN watchdog never fired is
    # treated as stale and retried once.
    for attempt in (0, 1):
        done = threading.Event()
        fired = threading.Event()

        def watchdog() -> None:
            if not done.wait(seconds) and not done.is_set():
                fired.set()
                con.interrupt()

        t = threading.Thread(target=watchdog, daemon=True)
        t.start()
        try:
            return con.execute(sql)
        except duckdb.InterruptException:
            if fired.is_set() or attempt == 1:
                raise
            # stale interrupt from a prior oracle's watchdog; the flag
            # is now consumed — run this oracle again
        finally:
            done.set()
            t.join()


def main() -> None:
    # first arg: head size N, or an explicit comma-separated query-name
    # list (for targeted probes, e.g. the top-cost family at sf1)
    names = None
    n = 50
    if len(sys.argv) > 1:
        try:
            n = int(sys.argv[1])
        except ValueError:
            names = [q for q in sys.argv[1].split(",") if q]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    oracle_timeout = float(sys.argv[3]) if len(sys.argv) > 3 else None

    from energy_pandas_spark.session import make_session

    spark = make_session(
        master="local[8]",
        app_name="driver-dryrun",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb

    # bounded pool: a hungry oracle must fail INSIDE DuckDB (a
    # recoverable OutOfMemoryException) instead of driving the whole
    # process toward system allocation failure — the sf10 sweep
    # measured one oracle ballooning the process to ~94 GB, after
    # which even thread creation raised MemoryError. Derive the cap
    # from the host's actual RAM (60%, ceilinged at 48GiB) so smaller
    # hosts keep the fail-inside-DuckDB property (ADVICE r5).
    try:
        total_gib = (
            os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        ) / (1 << 30)
        cap_gib = max(1, min(48, int(total_gib * 0.6)))
    except (ValueError, OSError):
        cap_gib = 48

    def _connect(d: str):
        c = ddb_connect(d)
        c.execute(f"SET memory_limit='{cap_gib}GiB'")
        return c

    con = _connect(sf_dir)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if names:
        unknown = [q for q in names if q not in queries]
        if unknown:
            sys.exit(f"unknown queries: {unknown}")
        head = names
    else:
        head = list(queries)[:n]
    bad = []
    timed_out = []
    oracle_oom = []
    for name in head:
        t0 = time.perf_counter()
        try:
            spdf = queries[name](spark, sf_dir).toPandas()
            if name not in oracles:
                print(f"  {name}: rows-only ({len(spdf)} rows)")
                continue
            try:
                res = _execute_with_timeout(con, oracles[name], oracle_timeout)
            except duckdb.OutOfMemoryException:
                # a hungry oracle can fill the shared connection's
                # buffer pool and cascade failures onto its NEIGHBORS
                # (observed in the sf10 sweep: one ~90 GB list-agg
                # oracle OOM'd, then three cheap oracles failed on the
                # same connection). Retry once on a FRESH connection so
                # only the truly resource-bound oracle is reported.
                con.close()
                con = _connect(sf_dir)
                try:
                    res = _execute_with_timeout(
                        con, oracles[name], oracle_timeout
                    )
                except duckdb.OutOfMemoryException:
                    # genuinely resource-bound at this sf: the ORACLE
                    # ran out, not the engine — same category as an
                    # oracle timeout (brute-force replies sized for the
                    # driver's sf), so don't fail the sweep on it
                    oracle_oom.append(name)
                    con.close()
                    con = _connect(sf_dir)
                    print(
                        f"  {name}: ORACLE-OOM at this sf (spark side "
                        "ran; value-checked at driver scale)"
                    )
                    continue
            compare_to_oracle(name, spdf, res)
            el = time.perf_counter() - t0
            print(f"  {name}: OK rows={len(spdf)} {el:.2f}s")
        except duckdb.InterruptException:
            timed_out.append(name)
            print(
                f"  {name}: ORACLE-TIMEOUT >{oracle_timeout:.0f}s at this "
                f"sf (spark side ran; value-checked at driver scale)"
            )
        except AssertionError as exc:
            print(f"  {name}: MISMATCH {exc}")
            bad.append(name)
        except Exception as exc:  # noqa: BLE001 — report and continue
            print(f"  {name}: ERROR {exc}")
            bad.append(name)
            # a FATAL DuckDB error (e.g. a system-level bad_alloc, as
            # opposed to the recoverable OutOfMemoryException) poisons
            # the connection — without a reconnect every later oracle
            # dies with "Connection has already been closed" (observed
            # in the sf10 chunk-3 sweep). Health-check and reconnect.
            try:
                con.execute("SELECT 1")
            except Exception:
                try:
                    con.close()
                except Exception:
                    pass
                con = _connect(sf_dir)
                print("    (oracle connection poisoned; reconnected)")
    n_soft = len(bad) + len(timed_out) + len(oracle_oom)
    print(
        f"\n{len(head) - n_soft}/{len(head)} clean; "
        f"failures: {bad}; oracle-timeouts: {timed_out}; "
        f"oracle-ooms: {oracle_oom}"
    )
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
