"""Registry-wide physical-plan audit — the automated form of the
compile-only sweep SURVEY §12 ran by hand: compile EVERY ``queries()``
entry at a small SF and assert the scale posture that the plan-lock
tests pin for individual queries holds for the whole registry:

- ZERO ``CartesianProduct`` anywhere (an all-pairs physical join is
  never acceptable; range joins must be bucketed or broadcast),
- ZERO ``BatchEvalPython`` (row-at-a-time Python; Arrow-batched
  ``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsInPandas``
  are the sanctioned Python crossings and are counted, not banned),
- ``SinglePartition`` exchanges only in queries on the committed
  whitelist (``scripts/plan_audit_baseline.json``) — the documented
  1-row final reduces and un-keyed reference variants. A NEW query
  acquiring a single-partition funnel fails the audit.

Caveat (recorded in SURVEY §12): exchange COUNTS in compiled strings
overstate runtime shuffles for persist-composed queries — every
InMemoryTableScan prints its full build lineage — so this audit gates
on PRESENCE of banned operators, never on exchange counts.

Usage:
    python scripts/plan_audit.py [sf_dir] [--rebaseline]

Exit 0 = clean; exit 1 = violations (printed). ``--rebaseline``
rewrites the SinglePartition whitelist from the current tree (review
the diff — every addition must cite why the funnel is bounded).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASELINE = os.path.join(REPO, "scripts", "plan_audit_baseline.json")


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--rebaseline"]
    rebaseline = "--rebaseline" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"

    import __spark_entry__ as entrymod
    from energy_pandas_spark.session import make_session

    spark = make_session(
        master="local[8]",
        app_name="plan-audit",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    oracle_backed = set(entrymod.oracle_sql())
    cartesian: list[str] = []
    batch_eval: list[str] = []
    single_part: list[str] = []
    array_outputs: list[str] = []
    arrow_crossings: dict[str, int] = {}
    errors: dict[str, str] = {}
    t0 = time.time()
    for i, (name, fn) in enumerate(qs.items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # compile failure IS a finding
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            continue
        # driver-canon contract (the r5 doc_hashed_embedding red): an
        # oracle-backed query must never ship an array/map/struct
        # column — the driver's pandas sort_values canonicalizer
        # cannot sort it. Schema-level twin of the execution-time
        # guard in tests/oracle_compare.py.
        if name in oracle_backed and any(
            t.dataType.typeName() in ("array", "map", "struct")
            for t in df.schema.fields
        ):
            array_outputs.append(name)
        if "CartesianProduct" in plan:
            cartesian.append(name)
        if "BatchEvalPython" in plan:
            batch_eval.append(name)
        if "SinglePartition" in plan:
            single_part.append(name)
        n_arrow = (
            plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas")
        )
        if n_arrow:
            arrow_crossings[name] = n_arrow
        if (i + 1) % 40 == 0:
            print(
                f"  ... {i + 1}/{len(qs)} compiled "
                f"({time.time() - t0:.0f}s)",
                file=sys.stderr,
                flush=True,
            )
    spark.stop()

    report = {
        "n_queries": len(qs),
        "n_compiled": len(qs) - len(errors),
        "cartesian_product": sorted(cartesian),
        "batch_eval_python": sorted(batch_eval),
        "single_partition": sorted(single_part),
        "array_outputs_on_oracle_backed": sorted(array_outputs),
        "arrow_crossings": dict(sorted(arrow_crossings.items())),
        "compile_errors": errors,
        "seconds": round(time.time() - t0, 1),
    }

    if rebaseline:
        with open(BASELINE, "w") as fh:
            json.dump(
                {"single_partition_allowed": sorted(single_part)},
                fh,
                indent=1,
                sort_keys=True,
            )
            fh.write("\n")
        print(f"baseline rewritten: {len(single_part)} whitelisted")

    allowed: set[str] = set()
    if os.path.exists(BASELINE):
        with open(BASELINE) as fh:
            allowed = set(json.load(fh)["single_partition_allowed"])
    new_funnels = sorted(set(single_part) - allowed)

    print(json.dumps(report, separators=(",", ":")))
    failures = []
    if cartesian:
        failures.append(f"CartesianProduct in: {cartesian}")
    if batch_eval:
        failures.append(f"BatchEvalPython in: {batch_eval}")
    if array_outputs:
        failures.append(
            "array/map/struct output on oracle-backed queries "
            f"(driver canon cannot sort): {array_outputs}"
        )
    if errors:
        failures.append(f"compile errors: {sorted(errors)}")
    if new_funnels and not rebaseline:
        failures.append(
            f"NEW SinglePartition funnels (not in baseline): {new_funnels}"
        )
    if failures:
        for f in failures:
            print(f"AUDIT FAIL: {f}", file=sys.stderr)
        sys.exit(1)
    print(
        f"audit clean: {report['n_compiled']}/{len(qs)} compiled, "
        f"0 cartesian, 0 row-Python, "
        f"{len(single_part)} whitelisted single-partition",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
