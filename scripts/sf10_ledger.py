"""Full-registry sf10 disposition ledger (VERDICT r6 #4): the r5/r6
sf10 sweeps proved "199 value-exact / 9 rows-only / 6 quadratic-oracle
timeouts" but recorded only COUNTS for the carried block, so the
membership of the never-individually-checked remainder is not
reconstructible from artifacts. This runner re-proves EVERY registry
query individually at sf10 (100x the driver's bench scale) and writes
a per-query JSON ledger — one terminal disposition per slot:

    value_exact    rows+schema+hash match vs the DuckDB oracle
    rows_only      no oracle by adjudicated nature (SURVEY §8 table);
                   the Spark side ran and its row count is recorded
    oracle_timeout the oracle exceeded the budget (the deliberately-
                   quadratic brute-force exactness references, sized
                   for the driver's sf0.01 — pinned, not re-burned)
    oracle_oom     the oracle exhausted its DuckDB memory cap
    mismatch/error red — must be fixed, never pinned

The six known quadratic-oracle queries are pinned from their r5/r6
measurements (each already burned a 300s budget twice; VERDICT r6 #4
explicitly allows a pinned terminal disposition where the oracle is
structurally too slow). Everything else executes live.

Resumable: dispositions merge into the ledger file; already-recorded
names are skipped, so an interrupted sweep continues where it left
off. Usage:

    python scripts/sf10_ledger.py [start:end] [sf_dir] [timeout_s] [ledger]

Parallel sweeps: give each worker a DISJOINT [start:end] range and its
OWN ledger file (4th arg) — save_ledger rewrites the whole dict, so
two workers sharing one file would drop each other's records — then
merge the shards (a dict union; ranges are disjoint). Env
``SF10_LEDGER_MEMGIB`` overrides the per-worker DuckDB memory cap so
two concurrent oracles cannot jointly exhaust the box.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tests.oracle_compare import compare_to_oracle, ddb_connect

from driver_dryrun import _execute_with_timeout  # noqa: E402

LEDGER = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scale",
    "ledger_r07_sf10.json",
)
if len(sys.argv) > 4:
    LEDGER = sys.argv[4]

# Quadratic brute-force oracle references, pinned from measured r5/r6
# sf10 runs (Spark side completed in every one; the oracle is the
# exactness reference sized for the driver's sf0.01).
PINNED_QUADRATIC = {
    "graph_components": "r5 sf10: oracle-timeout >300s (recursive CTE); spark side completed",
    "minhash_pairs": "r5 sf10: oracle-timeout >300s (all-pairs brute force); spark side completed",
    "minhash_cluster_stats_docs": "r5 sf10: oracle-timeout >300s (all-pairs + closure); spark side completed",
    "ngram_jaccard": "r5 sf10: oracle-timeout >300s (all-pairs gram join); spark side completed",
    "neardup_eval_docs": "r6 sf10: oracle-timeout >300s (exact inverted-index truth); spark side completed",
    "span_corrupt_docs": "r6 sf10: oracle-timeout >300s (quadratic span scan); spark side completed",
}


def load_ledger() -> dict:
    if os.path.exists(LEDGER):
        with open(LEDGER) as fh:
            return json.load(fh)
    return {}


def save_ledger(led: dict) -> None:
    tmp = LEDGER + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(led, fh, indent=1, sort_keys=True)
    os.replace(tmp, LEDGER)


def main() -> None:
    span = sys.argv[1] if len(sys.argv) > 1 else ":"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf10"
    timeout = float(sys.argv[3]) if len(sys.argv) > 3 else 300.0

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = list(queries)
    lo, _, hi = span.partition(":")
    names = names[int(lo or 0) : int(hi) if hi else len(names)]

    led = load_ledger()
    for name, why in PINNED_QUADRATIC.items():
        led.setdefault(
            name, {"disposition": "oracle_timeout", "pinned": why}
        )
    save_ledger(led)

    todo = [n for n in names if n not in led]
    if not todo:
        print(f"nothing to do: {len(names)} names all have dispositions")
        return
    print(f"{len(todo)} to run of {len(names)} requested (ledger: {len(led)})")

    from energy_pandas_spark.session import make_session

    spark = make_session(
        master="local[8]",
        app_name="sf10-ledger",
        shuffle_partitions=32,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import duckdb

    if os.environ.get("SF10_LEDGER_MEMGIB"):
        cap_gib = int(os.environ["SF10_LEDGER_MEMGIB"])
    else:
        try:
            total_gib = (
                os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
            ) / (1 << 30)
            cap_gib = max(1, min(48, int(total_gib * 0.6)))
        except (ValueError, OSError):
            cap_gib = 48

    def _connect():
        c = ddb_connect(sf_dir)
        c.execute(f"SET memory_limit='{cap_gib}GiB'")
        return c

    con = _connect()
    for i, name in enumerate(todo, 1):
        t0 = time.perf_counter()
        rec: dict = {}
        try:
            spdf = queries[name](spark, sf_dir).toPandas()
            el = round(time.perf_counter() - t0, 2)
            if name not in oracles:
                rec = {
                    "disposition": "rows_only",
                    "rows": len(spdf),
                    "seconds": el,
                }
            else:
                try:
                    res = _execute_with_timeout(con, oracles[name], timeout)
                    compare_to_oracle(name, spdf, res)
                    rec = {
                        "disposition": "value_exact",
                        "rows": len(spdf),
                        "seconds": round(time.perf_counter() - t0, 2),
                    }
                except duckdb.InterruptException:
                    rec = {
                        "disposition": "oracle_timeout",
                        "rows": len(spdf),
                        "spark_seconds": el,
                        "timeout_s": timeout,
                    }
                except duckdb.OutOfMemoryException:
                    con.close()
                    con = _connect()
                    rec = {
                        "disposition": "oracle_oom",
                        "rows": len(spdf),
                        "spark_seconds": el,
                    }
        except AssertionError as exc:
            rec = {"disposition": "mismatch", "detail": str(exc)[:300]}
        except Exception as exc:  # noqa: BLE001 — record and continue
            rec = {"disposition": "error", "detail": str(exc)[:300]}
            try:
                con.execute("SELECT 1")
            except Exception:
                try:
                    con.close()
                except Exception:
                    pass
                con = _connect()
        led[name] = rec
        save_ledger(led)
        print(f"  [{i}/{len(todo)}] {name}: {rec.get('disposition')} "
              f"rows={rec.get('rows')} {rec.get('seconds', rec.get('spark_seconds', '?'))}s",
              flush=True)
    spark.stop()

    dispositions: dict[str, int] = {}
    for rec in led.values():
        dispositions[rec["disposition"]] = (
            dispositions.get(rec["disposition"], 0) + 1
        )
    print(json.dumps({"ledger": len(led), "by_disposition": dispositions}))


if __name__ == "__main__":
    main()
