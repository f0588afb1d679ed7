"""Dry-run the driver's correctness gate: run the FIRST N queries()
entries (the driver hash-checks ~50 per round) against their DuckDB
oracles at sf0.01 — the driver's scale — and report per-query
row/column/value agreement. Usage:

    python scripts/driver_dryrun.py [N] [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entrymod
from tests.test_entry import _norm_rows


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

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    head = list(queries)[:n]
    bad = []
    for name in head:
        t0 = time.perf_counter()
        try:
            spdf = queries[name](spark, sf_dir).toPandas()
            scols = list(spdf.columns)
            srows = list(spdf.itertuples(index=False, name=None))
            if name not in oracles:
                print(f"  {name}: rows-only ({len(srows)} rows)")
                continue
            odf = con.execute(oracles[name]).fetch_df()
            ocols = list(odf.columns)
            orows = list(odf.itertuples(index=False, name=None))
            ok_cols = sorted(scols) == sorted(ocols)
            ok_rows = len(srows) == len(orows)
            ok_vals = (
                ok_cols
                and ok_rows
                and _norm_rows(scols, srows) == _norm_rows(ocols, orows)
            )
            status = "OK" if ok_vals else "MISMATCH"
            el = time.perf_counter() - t0
            print(
                f"  {name}: {status} rows={len(srows)}/{len(orows)} "
                f"cols={ok_cols} {el:.2f}s"
            )
            if not ok_vals:
                bad.append(name)
        except Exception as exc:  # noqa: BLE001 — report and continue
            print(f"  {name}: ERROR {exc}")
            bad.append(name)
    print(f"\n{len(head) - len(bad)}/{len(head)} clean; failures: {bad}")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
