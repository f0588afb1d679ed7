"""sf1 scaling spot-check for the LSH family (VERDICT r7 #4): run
minhash_pairs / crosscorpus_neardup / containment_pairs_docs at sf1
(the deterministic 10x replication from make_scale_probe.py) at a
caller-chosen core count, bench methodology (noop sink, per-iteration
drain, best-of-N). The r7 finding was that at sf0.1 NO slow query
parallelizes (8-core/32-core ratios 0.60-1.16 — job orchestration
dominates); this probe shows whether data-parallel work dominates at
10x the rows, i.e. whether the §2-class structure claims convert into
measured scaling.

Usage:
    SPARK_GRAFT_CPUS=32 python scripts/scaling_probe_r08.py \
        [sf_dir] [iters] [q1,q2,...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

DEFAULT_QUERIES = "minhash_pairs,crosscorpus_neardup,containment_pairs_docs"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names = (sys.argv[3] if len(sys.argv) > 3 else DEFAULT_QUERIES).split(",")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from energy_pandas_spark.session import make_session
    from energy_pandas_spark.util import drain_tracked_caches

    spark = make_session(
        master=f"local[{cpus}]",
        app_name="scaling-probe-r08",
        shuffle_partitions=int(cpus),
        driver_memory="24g",
        extra_conf={"spark.ui.enabled": "false"},
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
            print(f"# {name} iter {ts[-1]:.3f}s", file=sys.stderr, flush=True)
        out[name] = ts
    spark.stop()
    print(json.dumps({
        "sf_dir": sf_dir,
        "cpus": int(cpus),
        "iters": iters,
        "queries": out,
        "best": {k: min(v) for k, v in out.items()},
    }))


if __name__ == "__main__":
    main()
