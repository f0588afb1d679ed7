"""Cache-leak audit over the bench headline set (guide §1 honesty rule,
r6 cache-hygiene regime): run each query once through the noop sink and
report whether it leaves live entries in the JVM CacheManager. A leaked
persist (a) serves bench iterations 2-3 warm, making best-of-3 floors
dishonest, and (b) substitutes into any later query whose plan matches
(the ADVICE-r5 order-dependence class).

Usage: python scripts/cache_leak_audit.py [sf_dir] [name1,name2,...]
Prints one line per leaking query + a JSON summary.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from bench import HEADLINE


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = (
        [q for q in sys.argv[2].split(",") if q]
        if len(sys.argv) > 2
        else list(HEADLINE)
    )
    from energy_pandas_spark.session import make_session

    spark = make_session(
        master="local[8]",
        app_name="cache-leak-audit",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    jcm = spark._jsparkSession.sharedState().cacheManager()

    from energy_pandas_spark.util import drain_tracked_caches

    queries = entrymod.queries()
    leaks: dict[str, int] = {}
    errors: dict[str, str] = {}
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001 - audit keeps going
            errors[name] = str(exc)[:200]
            spark.catalog.clearCache()
            continue
        # the bench releases operator-held persists through the same
        # registry after each timed iteration; a query only counts as
        # leaking if caches survive that release path
        drain_tracked_caches()
        if not jcm.isEmpty():
            # count live cached plans via the storage list
            n = spark.sparkContext._jsc.sc().getRDDStorageInfo()
            leaks[name] = len(n)
            print(f"LEAK {name}: {len(n)} cached RDDs live after noop")
            spark.catalog.clearCache()
    print(json.dumps({"n": len(names), "leaks": leaks, "errors": errors}))
    spark.stop()


if __name__ == "__main__":
    main()
