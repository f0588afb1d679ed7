"""Straggler/serialization audit over the bench headline set (guide
§2.5 input skew, §2.6 stragglers): run every query once through the
noop sink on a UI-enabled session and flag

- single-task stages with meaningful CPU (>= cpu_ms floor) — the
  "single-file scan serializes the whole stage" class that _spread
  exists for (excluding legitimately 1-row/1-partition finals, which
  burn no CPU);
- queries with an outsized number of jobs (sequential materializations
  dominate their floor).

Usage: python scripts/straggler_audit.py [sf_dir] [cpu_ms_floor]
Writes /tmp/straggler_audit.json and prints a summary table.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bench import HEADLINE


def _rest(port: int, path: str):
    with urllib.request.urlopen(f"http://localhost:{port}/api/v1/{path}") as r:
        return json.loads(r.read())


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpu_floor = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from energy_pandas_spark.session import make_session
    from energy_pandas_spark.util import drain_tracked_caches

    spark = make_session(
        master=f"local[{cpus}]",
        app_name="straggler-audit",
        shuffle_partitions=int(cpus),
        driver_memory="16g",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4052"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app_id = spark.sparkContext.applicationId

    from energy_pandas_spark.sources.readers import TABLE_NAMES, load_table

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(64).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).limit(1).collect()

    queries = entrymod.queries()
    report = {}
    for name in HEADLINE:
        fn = queries[name]
        stages_before = {
            (s["stageId"], s["attemptId"])
            for s in _rest(port, f"applications/{app_id}/stages")
        }
        jobs_before = {j["jobId"] for j in _rest(port, f"applications/{app_id}/jobs")}
        spark.sparkContext.setJobDescription(f"audit:{name}")
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            report[name] = {"error": str(exc)[:200]}
            continue
        el = time.perf_counter() - t0
        drain_tracked_caches()
        spark.sparkContext.setJobDescription(None)
        stages = [
            s
            for s in _rest(port, f"applications/{app_id}/stages")
            if (s["stageId"], s["attemptId"]) not in stages_before
        ]
        n_jobs = len(
            [
                j
                for j in _rest(port, f"applications/{app_id}/jobs")
                if j["jobId"] not in jobs_before
            ]
        )
        single = [
            {
                "stage": s["stageId"],
                "cpu_ms": (s.get("executorCpuTime") or 0) // 1_000_000,
                "input_mb": round((s.get("inputBytes") or 0) / 1e6, 2),
                "name": s["name"].split("\n")[0][:60],
            }
            for s in stages
            if (s.get("numCompleteTasks") or 0) == 1
            and ((s.get("executorCpuTime") or 0) // 1_000_000) >= cpu_floor
        ]
        report[name] = {
            "wall_s": round(el, 2),
            "n_jobs": n_jobs,
            "n_stages": len(stages),
            "single_task_hot": single,
        }
        flag = " *" if single else ""
        print(
            f"# {name}: {el:.2f}s jobs={n_jobs} stages={len(stages)}"
            f" hot1={len(single)}{flag}",
            file=sys.stderr,
            flush=True,
        )
    with open("/tmp/straggler_audit.json", "w") as fh:
        json.dump(report, fh, indent=1)
    flagged = {k: v for k, v in report.items() if v.get("single_task_hot")}
    print(json.dumps({"flagged": list(flagged)}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
