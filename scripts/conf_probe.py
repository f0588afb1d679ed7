"""A/B probe of a session config against a query set (VERDICT r7 #5:
AQE coalescePartitions.minPartitionSize for byte-light CPU-dense
exchanges). Config is session-level, so each invocation runs ONE leg;
alternate legs (A B A B) from the shell and compare per-leg minima.

Usage:
    SPARK_GRAFT_CPUS=32 python scripts/conf_probe.py \
        "spark.sql.adaptive.coalescePartitions.minPartitionSize=64kb" \
        q1,q2,... [iters]

Pass an empty string as the first arg for the default-config leg.
Prints one JSON line: {conf, queries: {name: [times...]}, best: {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod


def main() -> None:
    conf_arg = sys.argv[1]
    names = [q for q in sys.argv[2].split(",") if q]
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    extra = {"spark.ui.enabled": "false"}
    if conf_arg:
        k, v = conf_arg.split("=", 1)
        extra[k] = v

    from energy_pandas_spark.session import make_session
    from energy_pandas_spark.util import drain_tracked_caches

    spark = make_session(
        master=f"local[{cpus}]",
        app_name="conf-probe",
        shuffle_partitions=int(cpus),
        driver_memory="16g",
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(64).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()
    from energy_pandas_spark.sources.readers import TABLE_NAMES, load_table
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).limit(1).collect()

    queries = entrymod.queries()
    out: dict[str, list[float]] = {}
    for name in names:
        fn = queries[name]
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
            drain_tracked_caches()
        out[name] = ts
        print(f"# {name} {min(ts):.3f}s", file=sys.stderr, flush=True)
    spark.stop()
    print(json.dumps({
        "conf": conf_arg or "default",
        "cpus": int(cpus),
        "queries": out,
        "best": {k: min(v) for k, v in out.items()},
        "total_best": round(sum(min(v) for v in out.values()), 3),
    }))


if __name__ == "__main__":
    main()
