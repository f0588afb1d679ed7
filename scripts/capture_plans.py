"""Capture .explain("formatted") output for declared queries into
plans/r07/<query>_<tag>.txt (guide §1: record the plan shape before and
after each optimization so claims are checkable without running Spark).

Usage: python scripts/capture_plans.py before|after q1,q2[,...] [sf_dir]

Note: operators with eager=True internals execute their materialization
at plan-build time; the captured plan is the final consumer plan (the
same object the bench's noop sink executes).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod


def main() -> None:
    tag = sys.argv[1]
    names = [q for q in sys.argv[2].split(",") if q]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from energy_pandas_spark.session import make_session
    from energy_pandas_spark.util import drain_tracked_caches

    spark = make_session(
        master=f"local[{cpus}]",
        app_name="capture-plans",
        shuffle_partitions=int(cpus),
        driver_memory="16g",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r07",
    )
    os.makedirs(outdir, exist_ok=True)

    queries = entrymod.queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        drain_tracked_caches()
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
