"""Dry-run the driver's correctness gate: run the FIRST N queries()
entries (the driver hash-checks ~50 per round) against their DuckDB
oracles at sf0.01 — the driver's scale — and report per-query
row/column/value agreement. Usage:

    python scripts/driver_dryrun.py [N] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tests.oracle_compare import compare_to_oracle, ddb_connect


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from energy_pandas_spark.session import make_session

    spark = make_session(
        master="local[8]",
        app_name="driver-dryrun",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = ddb_connect(sf_dir)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    head = list(queries)[:n]
    bad = []
    for name in head:
        t0 = time.perf_counter()
        try:
            spdf = queries[name](spark, sf_dir).toPandas()
            if name not in oracles:
                print(f"  {name}: rows-only ({len(spdf)} rows)")
                continue
            compare_to_oracle(name, spdf, con.execute(oracles[name]))
            el = time.perf_counter() - t0
            print(f"  {name}: OK rows={len(spdf)} {el:.2f}s")
        except AssertionError as exc:
            print(f"  {name}: MISMATCH {exc}")
            bad.append(name)
        except Exception as exc:  # noqa: BLE001 — report and continue
            print(f"  {name}: ERROR {exc}")
            bad.append(name)
    print(f"\n{len(head) - len(bad)}/{len(head)} clean; failures: {bad}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
