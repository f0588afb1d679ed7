"""Per-stage profile of one or more declared queries (guide §1: measure
first). Runs each query through the noop sink on a UI-enabled local
session, then dumps the Spark REST API's stage table — wall time, task
count, shuffle read/write bytes, input bytes — sorted by duration, plus
the job list with descriptions.

Usage:
    python scripts/profile_query.py q1,q2[,...] [sf_dir] [runs]

Prints one JSON document per query to stdout; human-readable table to
stderr. Timings are wall seconds for the noop materialization (cold,
first run) and min over ``runs`` repeats.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod


def _rest(port: int, path: str):
    with urllib.request.urlopen(f"http://localhost:{port}/api/v1/{path}") as r:
        return json.loads(r.read())


def main() -> None:
    names = [q for q in sys.argv[1].split(",") if q]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))

    from energy_pandas_spark.session import make_session
    from energy_pandas_spark.util import drain_tracked_caches

    spark = make_session(
        master=f"local[{cpus}]",
        app_name="profile-query",
        shuffle_partitions=int(cpus),
        driver_memory="16g",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4050"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app_id = spark.sparkContext.applicationId

    # same warmup as bench.py so first-query numbers are comparable
    from energy_pandas_spark.sources.readers import TABLE_NAMES, load_table

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(64).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()
    for t in TABLE_NAMES:
        load_table(spark, sf_dir, t).limit(1).collect()

    queries = entrymod.queries()
    for name in names:
        fn = queries[name]
        jobs_before = {j["jobId"] for j in _rest(port, f"applications/{app_id}/jobs")}
        stages_before = {
            (s["stageId"], s["attemptId"])
            for s in _rest(port, f"applications/{app_id}/stages")
        }
        spark.sparkContext.setJobDescription(f"profile:{name}")
        best = None
        for i in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            if i == 0:
                cold = el
            best = el if best is None else min(best, el)
            # mirror bench.py: every repeat is a COLD run
            drain_tracked_caches()
        spark.sparkContext.setJobDescription(None)

        jobs = [
            j
            for j in _rest(port, f"applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        stages = [
            s
            for s in _rest(port, f"applications/{app_id}/stages")
            if (s["stageId"], s["attemptId"]) not in stages_before
        ]
        stage_rows = []
        for s in sorted(stages, key=lambda s: -(s.get("executorRunTime") or 0)):
            stage_rows.append(
                {
                    "stage": s["stageId"],
                    "name": s["name"].split("\n")[0][:90],
                    "status": s["status"],
                    "tasks": s.get("numCompleteTasks"),
                    "run_ms": s.get("executorRunTime"),
                    "cpu_ms": (s.get("executorCpuTime") or 0) // 1_000_000,
                    "input_mb": round((s.get("inputBytes") or 0) / 1e6, 1),
                    "sh_read_mb": round((s.get("shuffleReadBytes") or 0) / 1e6, 2),
                    "sh_write_mb": round((s.get("shuffleWriteBytes") or 0) / 1e6, 2),
                    "spill_mb": round((s.get("diskBytesSpilled") or 0) / 1e6, 1),
                }
            )
        def _ts(v: str | None) -> float | None:
            if not v:
                return None
            from datetime import datetime

            return datetime.strptime(v[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()

        job_rows = []
        for j in sorted(jobs, key=lambda j: j["jobId"]):
            t_sub, t_done = _ts(j.get("submissionTime")), _ts(j.get("completionTime"))
            job_rows.append(
                {
                    "job": j["jobId"],
                    "desc": (j.get("description") or j["name"]).split("\n")[0][:90],
                    "ms": None
                    if t_sub is None or t_done is None
                    else round((t_done - t_sub) * 1000),
                    "stages": j.get("stageIds"),
                }
            )
        doc = {
            "query": name,
            "cold_s": round(cold, 3),
            "best_s": round(best, 3),
            "n_jobs": len(jobs),
            "n_stages": len(stages),
            "stages": stage_rows,
            "jobs": job_rows,
        }
        print(json.dumps(doc))
        print(f"== {name}: cold {cold:.2f}s best {best:.2f}s "
              f"jobs={len(jobs)} stages={len(stages)}", file=sys.stderr)
        for r in stage_rows[:14]:
            print(
                f"  st{r['stage']:>4} {r['run_ms']:>7}ms cpu{r['cpu_ms']:>7} "
                f"t{r['tasks']:>3} in{r['input_mb']:>8} shR{r['sh_read_mb']:>8} "
                f"shW{r['sh_write_mb']:>8} {r['name']}",
                file=sys.stderr,
            )

    spark.stop()


if __name__ == "__main__":
    main()
