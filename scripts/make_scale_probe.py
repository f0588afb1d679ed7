"""Build the sf1 scale-probe dataset (VERDICT r4 #7): a DETERMINISTIC
10x replication of /root/testdata/sf0.1 written to .scale/sf1/
(untracked). The driver ships no sf1, so the 10x-above-bench probe —
the scale where the rolling_fit 1-ulp divergence class lives — needs a
locally derived dataset.

Replication rules (copy k = 0..9; copy 0 is the original rows so sf0.1
results embed exactly):

- region/nation: NOT replicated (fixed dimensions, like TPC-H).
- customer/supplier/part/orders/lineitem/events/documents/embeddings:
  every key column offsets by k * KEYSPACE[table] so primary keys stay
  unique and foreign keys stay consistent within a copy.
- documents.text: ~1/8 of tokens per copy k>0 get a deterministic
  "~k" suffix (seeded by xxhash64(token, doc_id, k)), so copies are
  NOT near-duplicates of each other — without this every doc would
  gain 9 planted near-dups and the near-dup/pair queries would probe a
  quadratic blow-up instead of a 10x corpus.
- embeddings.embedding: component i of copy k>0 gets a deterministic
  [-0.25, 0.25) additive perturbation seeded by (id, i, k) — copies
  decorrelate instead of forming distance-0 clusters.
- events.ts keeps its window (10x density, same span — the realistic
  scale direction for an event stream); value/props unchanged.

An optional third argument sets the copy count (default 10), so the
same generator builds the sf10 probe (100 copies of sf0.1 = 100x bench
scale) — the key offsets below leave headroom for k up to ~99 without
collision (largest composite key: l_orderkey 99 * 10^9 < 2^63).

Usage: python scripts/make_scale_probe.py [src_sf_dir] [dest_dir] [n_copies]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_COPIES = 10

# key columns per table; offsets use a fixed power-of-ten keyspace
# comfortably above the sf0.1 max of each id so copies never collide
KEYS = {
    "customer": {"c_custkey": 10**7},
    "supplier": {"s_suppkey": 10**6},
    "part": {"p_partkey": 10**7},
    "orders": {"o_orderkey": 10**9, "o_custkey": 10**7},
    "lineitem": {
        "l_orderkey": 10**9,
        "l_partkey": 10**7,
        "l_suppkey": 10**6,
    },
    "events": {"event_id": 10**9, "user_id": 10**7},
    "documents": {"doc_id": 10**8},
    "embeddings": {"vec_id": 10**8},
}

# name columns bijective with a key in the source data (TPC-H names
# embed the key): suffix them per copy k>0, or ten distinct keys would
# share one name and any name-grouping oracle (e.g. q21's GROUP BY
# s_name) would merge rows the key-grouping plan keeps apart
NAME_COLS = {
    "supplier": ["s_name"],
    "customer": ["c_name"],
    "part": ["p_name"],
}


def main() -> None:
    global N_COPIES
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dest = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        repo, ".scale", "sf1"
    )
    if len(sys.argv) > 3:
        N_COPIES = int(sys.argv[3])
    os.makedirs(dest, exist_ok=True)

    from pyspark.sql import functions as F

    from energy_pandas_spark.session import make_session
    from energy_pandas_spark.sources.readers import load_table

    spark = make_session(
        master="local[16]",
        app_name="make-scale-probe",
        shuffle_partitions=16,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    for t in ("region", "nation"):
        load_table(spark, src, t).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(dest, f"{t}.parquet")
        )
        print(f"{t}: copied (fixed dimension)", flush=True)

    for t, keys in KEYS.items():
        base = load_table(spark, src, t)
        copies = []
        for k in range(N_COPIES):
            c = base
            for col, space in keys.items():
                c = c.withColumn(col, F.col(col) + F.lit(k * space))
            if k > 0:
                for col in NAME_COLS.get(t, ()):
                    c = c.withColumn(
                        col, F.concat(F.col(col), F.lit(f"~{k}"))
                    )
            if k > 0 and t == "documents":
                toks = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
                c = c.withColumn(
                    "__toks",
                    F.transform(
                        toks,
                        lambda x: F.when(
                            F.pmod(
                                F.xxhash64(x, F.col("doc_id"), F.lit(k)),
                                F.lit(8),
                            )
                            == 0,
                            F.concat(x, F.lit(f"~{k}")),
                        ).otherwise(x),
                    ),
                ).withColumn(
                    "text",
                    F.when(
                        F.col("text").isNotNull(),
                        F.array_join(F.col("__toks"), " "),
                    ),
                ).drop("__toks")
            if k > 0 and t == "embeddings":
                c = c.withColumn(
                    "embedding",
                    F.transform(
                        F.col("embedding"),
                        lambda x, i: (
                            x.cast("double")
                            + (
                                F.pmod(
                                    F.xxhash64(F.col("vec_id"), i, F.lit(k)),
                                    F.lit(1000),
                                ).cast("double")
                                / F.lit(2000.0)
                                - F.lit(0.25)
                            )
                        ).cast("float"),
                    ),
                )
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(os.path.join(dest, f"{t}.parquet"))
        n = spark.read.parquet(os.path.join(dest, f"{t}.parquet")).count()
        print(f"{t}: {n} rows", flush=True)

    spark.stop()
    print(f"scale probe written to {dest}")


if __name__ == "__main__":
    main()
