"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 plus
the training-data-pipeline surface (dedup / similarity / text /
multimodal / streaming-equivalent windows) as (spark, sf_dir) ->
DataFrame callables; ``oracle_sql()`` holds the DuckDB-equivalent SQL
for every SQL-expressible query (identical output column names — the
driver compares columns sorted by name). Non-SQL-expressible operators
(LSH candidate generation, SimHash, IVF, typical-period clustering,
multimodal decode) are present without oracles -> rows-only checks.

Determinism conventions shared by both sides:
- session timezone pinned to UTC (timestamps are naive/UTC in parquet);
- double aggregates rounded (2-6 digits depending on magnitude) AFTER
  ordering decisions, with unique tiebreak keys on every top-k;
- events.ts is TIMESTAMP(NANOS) parquet: Spark reads int64 + rebuilds
  microseconds (floor), matching DuckDB's ns->us truncation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from energy_pandas_spark.util import track_cache
from energy_pandas_spark.sources.readers import load_table
from energy_pandas_spark.units import unit_registry


def _prep(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # testdata parquet stores naive timestamp[us]; Spark 4 infers NTZ by
    # default, which shifts semantics vs the DuckDB oracle (naive=UTC)
    # and breaks unix_micros-based windows. Read as TIMESTAMP (UTC).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


# Exact-money arithmetic (VERDICT r3 #1): every money/measure column in
# the testdata is a double sitting exactly on a 2-decimal grid (max
# observed deviation from the grid ~1e-9 — pure float representation
# error).  Casting each FACTOR to a tight DECIMAL before multiplying and
# summing makes the aggregate exact and ORDER-FREE: partial-aggregation
# order (partition count, AQE re-plans) can never flip a rounded digit,
# where a float64 sum + round(,2) lands on half-cent boundaries
# differently per engine (the r3 q10 red).  The DuckDB oracles carry the
# same casts, so both engines compute the identical exact value; final
# outputs cast back to DOUBLE so result schemas are unchanged.
_DMONEY = "decimal(12,2)"  # prices / quantities / balances / event values
_DRATE = "decimal(4,2)"    # discount / tax factors in [0, 2)


def _m(name: str):
    """Exact DECIMAL(12,2) of a 2-decimal-grid double column."""
    return F.col(name).cast(_DMONEY)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary over lineitem (scan -> filter ->
    hash agg with map-side partials; Catalyst pushes the shipdate filter
    into the parquet scan).  Money sums run in exact decimal (order-free).
    The averages ship as micro-quantized BIGINTs
    ``(cents * 10^4) div n`` — a ratio of a 2-dp decimal over a count
    CAN be an exact decimal half (the tumbling_1h sf1 precedent:
    13911.30/320 = 43.4728125) where Spark's HALF_UP round and DuckDB's
    ties-to-even disagree; integer `div` truncates toward zero
    identically on both engines."""
    _prep(spark)
    li = _t(spark, sf_dir, "lineitem")
    disc_f = (1 - F.col("l_discount")).cast(_DRATE)
    tax_f = (1 + F.col("l_tax")).cast(_DRATE)
    n = F.count(F.lit(1))
    qty_cents = (F.sum(_m("l_quantity")) * 100).cast("long")
    price_cents = (F.sum(_m("l_extendedprice")) * 100).cast("long")
    disc_cents = (F.sum(F.col("l_discount").cast(_DRATE)) * 100).cast("long")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_m("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(_m("l_extendedprice")), 2)
            .cast("double")
            .alias("sum_base_price"),
            F.round(F.sum(_m("l_extendedprice") * disc_f), 2)
            .cast("double")
            .alias("sum_disc_price"),
            F.round(F.sum(_m("l_extendedprice") * disc_f * tax_f), 2)
            .cast("double")
            .alias("sum_charge"),
            (qty_cents * 10000).alias("__qc"),
            (price_cents * 10000).alias("__pc"),
            (disc_cents * 10000).alias("__dc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            F.expr("__qc div count_order").alias("avg_qty_micro"),
            F.expr("__pc div count_order").alias("avg_price_micro"),
            F.expr("__dc div count_order").alias("avg_disc_micro"),
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity::DECIMAL(12,2)), 2)::DOUBLE        AS sum_qty,
       round(sum(l_extendedprice::DECIMAL(12,2)), 2)::DOUBLE   AS sum_base_price,
       round(sum(l_extendedprice::DECIMAL(12,2)
                 * (1 - l_discount)::DECIMAL(4,2)), 2)::DOUBLE AS sum_disc_price,
       round(sum(l_extendedprice::DECIMAL(12,2)
                 * (1 - l_discount)::DECIMAL(4,2)
                 * (1 + l_tax)::DECIMAL(4,2)), 2)::DOUBLE      AS sum_charge,
       ((sum(l_quantity::DECIMAL(12,2)) * 100)::BIGINT
         * 10000 // count(*))::BIGINT                          AS avg_qty_micro,
       ((sum(l_extendedprice::DECIMAL(12,2)) * 100)::BIGINT
         * 10000 // count(*))::BIGINT                          AS avg_price_micro,
       ((sum(l_discount::DECIMAL(4,2)) * 100)::BIGINT
         * 10000 // count(*))::BIGINT                          AS avg_disc_micro,
       count(*)                                                AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: 3-way join (broadcast the filtered customer dim)
    -> per-order revenue -> top 10."""
    _prep(spark)
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_rev()).alias("__rev"))
        .orderBy(F.desc("__rev"), "o_orderdate", "l_orderkey")
        .limit(10)
        .select(
            "l_orderkey",
            F.round("__rev", 4).cast("double").alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


_Q3_SQL = """
SELECT l_orderkey, round(rev, 4)::DOUBLE AS revenue, o_orderdate, o_orderpriority
FROM (
  SELECT l_orderkey, o_orderdate, o_orderpriority,
         sum(l_extendedprice::DECIMAL(12,2)
             * (1 - l_discount)::DECIMAL(4,2)) AS rev
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '1998-03-15'
    AND l_shipdate  > TIMESTAMP '1998-03-15'
  GROUP BY l_orderkey, o_orderdate, o_orderpriority
)
ORDER BY rev DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped multi-join: region/nation dims broadcast; the
    fact-side joins shuffle on their keys."""
    _prep(spark)
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(_rev()), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


_Q5_SQL = """
SELECT r_name, n_name,
       round(sum(l_extendedprice::DECIMAL(12,2)
                 * (1 - l_discount)::DECIMAL(4,2)), 2)::DOUBLE AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-shaped forecast-revenue delta: scan -> three conjunctive
    filters (ALL pushed into the parquet scan — date range, discount
    band, quantity cap) -> single global agg. The plan is one codegen'd
    stage plus a 1-row final agg; at 100 TB it reads only the three
    referenced columns and row groups passing the stats filters."""
    _prep(spark)
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(_m("l_extendedprice") * F.col("l_discount").cast(_DRATE)), 2
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


_Q6_SQL = """
SELECT round(sum(l_extendedprice::DECIMAL(12,2)
                 * l_discount::DECIMAL(4,2)), 2)::DOUBLE AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01'
  AND l_shipdate <  TIMESTAMP '1995-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def top_spenders_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: the 3 highest-spending customers in every
    nation. Grouped spend agg, broadcast join to the customer dim, then
    rank inside a per-nation window — the window shuffle is keyed on
    nation, never a single global sort; ties break on custkey so the
    result is deterministic."""
    _prep(spark)
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    spend = orders.groupBy("o_custkey").agg(F.sum(_m("o_totalprice")).alias("__tp"))
    joined = spend.join(
        F.broadcast(cust.select("c_custkey", "c_name", "c_nationkey")),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    from energy_pandas_spark.operators.analytics import topk_per_group

    ranked = topk_per_group(
        joined,
        by="c_nationkey",
        order_by=[F.desc("__tp"), F.asc("c_custkey")],
        k=3,
    )
    return (
        ranked.select(
            "c_nationkey",
            "rank",
            "c_custkey",
            "c_name",
            F.round("__tp", 2).cast("double").alias("total_spent"),
        )
        .orderBy("c_nationkey", "rank")
    )


_TOPK_PER_NATION_SQL = """
SELECT c_nationkey, rank, c_custkey, c_name, round(tp, 2)::DOUBLE AS total_spent
FROM (
  SELECT c_nationkey, c_custkey, c_name, tp,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY tp DESC, c_custkey) AS rank
  FROM (
    SELECT o_custkey, sum(o_totalprice::DECIMAL(12,2)) AS tp
    FROM orders GROUP BY o_custkey
  )
  JOIN customer ON o_custkey = c_custkey
)
WHERE rank <= 3
ORDER BY c_nationkey, rank
"""


def above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the engine's SQL surface:
    orders priced above their priority's average. Catalyst decorrelates
    this into an aggregate + equi-join (no per-row subquery execution);
    the same text runs on DuckDB as the oracle."""
    _prep(spark)
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderkey, o_orderpriority,
               round(o_totalprice, 2) AS price
        FROM orders_v o
        WHERE o_totalprice > 2 * (
          SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                 / count(*)
          FROM orders_v o2
          WHERE o2.o_orderpriority = o.o_orderpriority
        )
        ORDER BY o_orderkey
        """
    )


_ABOVE_AVG_SQL = """
SELECT o_orderkey, o_orderpriority, round(o_totalprice, 2) AS price
FROM orders o
WHERE o_totalprice > 2 * (
  SELECT CAST(sum(CAST(o2.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*)
  FROM orders o2
  WHERE o2.o_orderpriority = o.o_orderpriority
)
ORDER BY o_orderkey
"""


def rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ``rollup`` (GROUPING SETS family):
    per (returnflag, linestatus), per returnflag, and grand total in ONE
    hash-aggregate pass — Spark plans grouping sets as a single Expand +
    aggregate, so the scan happens once no matter how many levels.
    ``grouping_id`` disambiguates subtotal rows from real NULL keys."""
    _prep(spark)
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum(_m("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(_m("l_extendedprice")), 2)
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("gid", "l_returnflag", "l_linestatus")
    )


_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag, l_linestatus) AS gid,
       count(*) AS n_rows,
       round(sum(l_quantity::DECIMAL(12,2)), 2)::DOUBLE AS sum_qty,
       round(sum(l_extendedprice::DECIMAL(12,2)), 2)::DOUBLE AS sum_price
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY gid, l_returnflag, l_linestatus
"""


def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cross-tabulation via ``cube``: all 2^k grouping combinations
    of (orderpriority, orderstatus) in one Expand+aggregate pass."""
    _prep(spark)
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(_m("o_totalprice")), 2).cast("double").alias("sum_price"),
        )
        .orderBy("gid", "o_orderpriority", "o_orderstatus")
    )


_CUBE_SQL = """
SELECT o_orderpriority, o_orderstatus,
       GROUPING(o_orderpriority, o_orderstatus) AS gid,
       count(*) AS n_orders,
       round(sum(o_totalprice::DECIMAL(12,2)), 2)::DOUBLE AS sum_price
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
ORDER BY gid, o_orderpriority, o_orderstatus
"""


def ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile bucketing with ``ntile``: every event assigned its
    within-type value quartile (ties broken by event_id so the bucket
    boundary is deterministic on any engine)."""
    _prep(spark)
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.asc("value"), F.asc("event_id"))
    return (
        ev.select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("event_id")
    )


_NTILE_SQL = """
SELECT event_id, event_type, round(value, 6) AS value,
       ntile(4) OVER (PARTITION BY event_type
                      ORDER BY value ASC, event_id ASC) AS quartile
FROM events ORDER BY event_id
"""


def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.sum(_m("o_totalprice")).alias("__tp"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .orderBy(F.desc("__tp"), "o_custkey")
        .limit(10)
        .select(
            "c_custkey",
            "c_name",
            F.round("__tp", 2).cast("double").alias("total_spent"),
            "n_orders",
        )
    )


_TOP_CUSTOMERS_SQL = """
SELECT c_custkey, c_name, round(tp, 2)::DOUBLE AS total_spent, n_orders
FROM (
  SELECT o_custkey, sum(o_totalprice::DECIMAL(12,2)) AS tp,
         count(*) AS n_orders
  FROM orders GROUP BY o_custkey
)
JOIN customer ON o_custkey = c_custkey
ORDER BY tp DESC, o_custkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# energy-pandas core semantics (SURVEY §2.1-2.4) over the events series
# ---------------------------------------------------------------------------


def with_timeindex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: synthesized hourly time index (spark.range + interval
    arithmetic; zero shuffles)."""
    _prep(spark)
    from energy_pandas_spark.core.timeindex import time_index

    return time_index(spark, 168, base_year=2018).select(
        "idx", "ts", F.col("idx").cast("double").alias("temp")
    )


_WITH_TIMEINDEX_SQL = """
SELECT i AS idx,
       TIMESTAMP '2018-01-01 00:00:00' + to_hours(i) AS ts,
       CAST(i AS DOUBLE) AS temp
FROM generate_series(0, 167) t(i)
"""


def to_units_kelvin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2: affine unit conversion degC -> K compiled from the registry
    into plain column arithmetic."""
    _prep(spark)
    ev = _t(spark, sf_dir, "events")
    slope, icept = unit_registry.conversion("degC", "kelvin")
    return ev.select(
        "event_id",
        F.round(F.col("value") * F.lit(slope) + F.lit(icept), 6).alias("value_k"),
    )


_TO_UNITS_KELVIN_SQL = """
SELECT event_id, round(value * 1.0 + 273.15, 6) AS value_k FROM events
"""


def to_units_degr_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: per-column conversion from DIFFERENT source units to one
    target (degC->degR and K->degR in one select)."""
    _prep(spark)
    ev = _t(spark, sf_dir, "events")
    s1, b1 = unit_registry.conversion("degC", "degR")
    s2, b2 = unit_registry.conversion("K", "degR")
    return ev.select(
        "event_id",
        F.round(F.col("value") * F.lit(s1) + F.lit(b1), 6).alias("as_c_to_r"),
        F.round(F.col("value") * F.lit(s2) + F.lit(b2), 6).alias("as_k_to_r"),
    )


_TO_UNITS_DEGR_SQL = f"""
SELECT event_id,
       round(value * {unit_registry.conversion('degC', 'degR')[0]!r}
             + {unit_registry.conversion('degC', 'degR')[1]!r}, 6) AS as_c_to_r,
       round(value * {unit_registry.conversion('K', 'degR')[0]!r}, 6) AS as_k_to_r
FROM events
"""


def to_ip_watts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: table-driven to_ip — W maps to Btu/h via the default IP
    conversion table; identical literal slope on both sides."""
    _prep(spark)
    ev = _t(spark, sf_dir, "events")
    slope, _ = unit_registry.conversion("W", "Btu/h")
    return ev.select(
        "event_id", F.round(F.col("value") * F.lit(slope), 6).alias("value_btuh")
    )


_TO_IP_WATTS_SQL = f"""
SELECT event_id, round(value * {unit_registry.conversion('W', 'Btu/h')[0]!r}, 6) AS value_btuh
FROM events
"""


def normalize_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: min-max normalize (1-row broadcast aggregate, no window)."""
    _prep(spark)
    from energy_pandas_spark.operators.analytics import normalize

    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    out = normalize(ev, ["value"])
    return out.select("event_id", F.round("value", 6).alias("value_norm"))


_NORMALIZE_SQL = """
SELECT event_id,
       round((value - min(value) OVER ()) / (max(value) OVER () - min(value) OVER ()), 6)
         AS value_norm
FROM events
"""


def ldc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1: load-duration curve — distributed rank (range partition +
    per-partition row_number + broadcast offsets)."""
    _prep(spark)
    from energy_pandas_spark.operators.analytics import ldc as _ldc

    ev = _t(spark, sf_dir, "events").select("value")
    return _ldc(ev, "value", index_name="idx")


_LDC_SQL = """
SELECT row_number() OVER (ORDER BY value DESC) - 1 AS idx, value
FROM events
"""


def monthly_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: month-end-labelled downsampling of the events series."""
    _prep(spark)
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.last_day(F.date_trunc("month", "ts")).alias("month_end"))
        .agg(F.expr(_AVG_MICRO).alias("value_micro"))
        .orderBy("month_end")
    )


_MONTHLY_SQL = """
SELECT last_day(date_trunc('month', ts)) AS month_end,
       ((sum(value::DECIMAL(12,2)) * 100)::BIGINT * 10000
          // count(value))::BIGINT AS value_micro
FROM events GROUP BY 1 ORDER BY 1
"""


def resample_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freq-general resample (6-hour buckets via epoch arithmetic —
    codegen'd long math, identical buckets to an epoch-floor in any
    engine); avg + count per bucket."""
    _prep(spark)
    from energy_pandas_spark.operators.analytics import resample

    # two-column resample: exact decimal sum + non-null count ride ONE
    # aggregation, and the shipped average is the exact integer micro
    # (round(avg, 6) is tie-ambiguous — the daily_profile sf10 find)
    ev = _t(spark, sf_dir, "events").select(
        "ts",
        F.col("value").cast("decimal(12,2)").alias("value"),
        F.col("value").isNotNull().cast("long").alias("n"),
    )
    out = resample(ev, "ts", "6 hours", ["value", "n"], agg="sum")
    return out.select(
        F.col("ts").alias("bucket"),
        F.expr(
            "CASE WHEN n = 0 THEN NULL"
            " ELSE (CAST(value * 100 AS BIGINT) * 10000L) div n END"
        ).alias("avg_value_micro"),
    ).orderBy("bucket")


_RESAMPLE_SQL = """
SELECT make_timestamp((floor(epoch(ts) / 21600) * 21600)::BIGINT * 1000000) AS bucket,
       ((sum(value::DECIMAL(12,2)) * 100)::BIGINT * 10000
          // count(value))::BIGINT AS avg_value_micro
FROM events GROUP BY 1 ORDER BY 1
"""


def gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid reindex + forward fill per user: hourly averages
    resampled first, then each user's own [min, max] hour range gridded
    with sequence+explode and holes forward-filled by an ignorenulls
    window inside the user partition."""
    _prep(spark)
    from energy_pandas_spark.operators.analytics import fill_gaps

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    hourly = (
        ev.groupBy(
            "user_id",
            F.timestamp_seconds(
                (F.floor(F.unix_timestamp("ts") / 3600)).cast("long") * 3600
            ).alias("h"),
        )
        .agg(F.expr(_AVG_MICRO).alias("v"))
    )
    out = fill_gaps(hourly, "h", "1 hour", "v", by="user_id", method="ffill")
    return out.select("user_id", "h", "v", "is_gap").orderBy("user_id", "h")


_GAP_FILL_SQL = """
WITH hourly AS (
  SELECT user_id,
         make_timestamp((floor(epoch(ts) / 3600) * 3600)::BIGINT * 1000000) AS h,
         (CASE WHEN count(value) = 0 THEN NULL
               ELSE (sum(value::DECIMAL(12,2)) * 100)::BIGINT * 10000
                      // count(value) END)::BIGINT AS v
  FROM events WHERE user_id < 40 GROUP BY 1, 2
), bounds AS (
  SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1
), grid AS (
  SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
  FROM bounds
)
SELECT g.user_id, g.h,
       last_value(hv.v IGNORE NULLS)
         OVER (PARTITION BY g.user_id ORDER BY g.h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v,
       hv.v IS NULL AS is_gap
FROM grid g
LEFT JOIN hourly hv ON g.user_id = hv.user_id AND g.h = hv.h
ORDER BY g.user_id, g.h
"""


def value_diff_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lagged difference per user ordered by event time (pandas .diff;
    the meter-delta transform) — window lag inside the user partition,
    deterministic tiebreak on event_id for equal timestamps."""
    _prep(spark)
    from energy_pandas_spark.operators.analytics import diff

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    out = diff(
        ev.select("user_id", "ts", "event_id", "value"),
        "ts",
        ["value"],
        by="user_id",
        tiebreak="event_id",
        keep_cols=["event_id"],
    )
    return out.select(
        "user_id", "event_id", F.round("value", 6).alias("delta")
    ).orderBy("user_id", "event_id")


_DIFF_SQL = """
SELECT user_id, event_id,
       round(value - lag(value) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id), 6) AS delta
FROM events WHERE user_id < 40
ORDER BY user_id, event_id
"""


def zscore_outliers_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-scores + outlier flags: one hash agg for group
    stats, broadcast join back, pure column arithmetic — the
    quality-filter primitive."""
    _prep(spark)
    from energy_pandas_spark.operators.analytics import zscore_outliers

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = zscore_outliers(ev, "value", by="event_type", threshold=3.0)
    return out.select(
        "event_id",
        "event_type",
        F.round("zscore", 6).alias("zscore"),
        "is_outlier",
    ).orderBy("event_id")


_ZSCORE_SQL = """
WITH stats AS (
  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
  FROM events GROUP BY 1
)
SELECT e.event_id, e.event_type,
       round(CASE WHEN sigma IS NULL OR sigma = 0 THEN 0.0
                  ELSE (e.value - mu) / sigma END, 6) AS zscore,
       abs(CASE WHEN sigma IS NULL OR sigma = 0 THEN 0.0
                ELSE (e.value - mu) / sigma END) > 3.0 AS is_outlier
FROM events e JOIN stats USING (event_type)
ORDER BY e.event_id
"""


def p_max_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: peak load per group."""
    _prep(spark)
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.max("value").alias("p_max"))
        .orderBy("event_type")
    )


_P_MAX_SQL = """
SELECT event_type, max(value) AS p_max FROM events GROUP BY 1 ORDER BY 1
"""


def capacity_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: mean/max in one partial+final aggregation."""
    _prep(spark)
    ev = _t(spark, sf_dir, "events")
    # exact integer micro: avg/max = S_cents / (n * max_cents) — an
    # exact rational (2-dp values), so round(,6) is tie-ambiguous
    return ev.agg(
        F.expr(
            "(CAST(sum(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT)"
            " * 1000000L) div (count(value)"
            " * CAST(max(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT))"
        ).alias("capacity_factor_micro")
    )


_CAPACITY_FACTOR_SQL = """
SELECT ((sum(value::DECIMAL(12,2)) * 100)::BIGINT * 1000000
          // (count(value) * (max(value::DECIMAL(12,2)) * 100)::BIGINT)
       )::BIGINT AS capacity_factor_micro
FROM events
"""


def time_at_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: earliest timestamp of the global minimum (deterministic under
    ties)."""
    _prep(spark)
    from energy_pandas_spark.operators.analytics import time_at_min as _tam

    ev = _t(spark, sf_dir, "events")
    return _tam(ev, "ts", "value")


_TIME_AT_MIN_SQL = """
SELECT min(ts) AS ts FROM events
WHERE value = (SELECT min(value) FROM events)
"""


def source_side(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: heat-pump source-side transform (pure arithmetic)."""
    _prep(spark)
    from energy_pandas_spark.operators.analytics import source_side as _ss

    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    out = _ss(ev, ["value"], scoph=4.0)
    return out.select("event_id", F.round("value", 6).alias("value_src"))


_SOURCE_SIDE_SQL = """
SELECT event_id, round(value * 0.75, 6) AS value_src FROM events
"""


def ldc_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: conditional scaling on the rank-ordered curve."""
    _prep(spark)
    from energy_pandas_spark.operators.analytics import ldc_source as _ls

    ev = _t(spark, sf_dir, "events").select("value")
    out = _ls(ev, "value", scoph=4.0, scopc=3.0)
    return out.select("idx", F.round("value", 6).alias("value"))


_LDC_SOURCE_SQL = """
SELECT row_number() OVER (ORDER BY value DESC) - 1 AS idx,
       round(CASE WHEN value > 0 THEN value * 0.75
                  ELSE value * (1 + 1.0/3.0) END, 6) AS value
FROM events
"""


def rowwise_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: axis-1 reduction as a row-wise expression."""
    _prep(spark)
    ev = _t(spark, sf_dir, "events")
    a = F.col("value")
    b = F.col("value") * 2
    return ev.select(
        "event_id",
        F.round((a + b) / 2, 6).alias("mean"),
        F.round(a + b, 6).alias("sum"),
    )


_ROWWISE_MEAN_SQL = """
SELECT event_id,
       round((value + value * 2) / 2, 6) AS mean,
       round(value + value * 2, 6) AS sum
FROM events
"""


def reportdata_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: ReportData ingestion — timestamp reassembly from parts,
    interval shift, duplicate-timestamp dedup by sum."""
    _prep(spark)
    from energy_pandas_spark.sources.reportdata import from_reportdata

    ev = _t(spark, sf_dir, "events")
    report = ev.select(
        F.month("ts").alias("Month"),
        F.dayofmonth("ts").alias("Day"),
        F.hour("ts").alias("Hour"),
        F.minute("ts").alias("Minute"),
        F.lit(60).alias("Interval"),
        F.col("value").cast(_DMONEY).alias("Value"),
        F.lit("J").alias("Units"),
        F.lit("Load").alias("Name"),
    )
    ef = from_reportdata(report, name="load", base_year=2024)
    return ef.spark_df.select(
        "ts", F.round("load", 6).cast("double").alias("load")
    ).orderBy("ts")


_REPORTDATA_SERIES_SQL = """
SELECT date_trunc('minute', ts) - INTERVAL 60 MINUTE AS ts,
       round(sum(value::DECIMAL(12,2)), 6)::DOUBLE AS load
FROM events GROUP BY 1 ORDER BY 1
"""

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def reportdata_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: wide ReportData — pivot Value by KeyValue per TimeIndex
    (pivot_table mean parity)."""
    _prep(spark)
    from energy_pandas_spark.sources.reportdata import from_reportdata_pivot

    ev = _t(spark, sf_dir, "events")
    report = ev.select(
        (F.unix_timestamp("ts") / 3600).cast("long").alias("TimeIndex"),
        F.month("ts").alias("Month"),
        F.dayofmonth("ts").alias("Day"),
        F.hour("ts").alias("Hour"),
        F.minute("ts").alias("Minute"),
        F.lit(60).alias("Interval"),
        F.col("value").cast(_DMONEY).alias("Value"),
        F.lit("J").alias("Units"),
        F.col("event_type").alias("KeyValue"),
    )
    # sum cells, not mean: inputs have 2 decimals, so sums round
    # stably at 6 digits while means land on round-half boundaries
    # where Spark/DuckDB last-ulp summation order flips the digit
    ef = from_reportdata_pivot(
        report, base_year=2024, key_values=_EVENT_TYPES, agg_func="sum"
    )
    cols = [F.round(c, 6).cast("double").alias(c) for c in _EVENT_TYPES]
    return ef.spark_df.select("ts", *cols).orderBy("ts")


_REPORTDATA_PIVOT_SQL = """
SELECT min(date_trunc('minute', ts) - INTERVAL 60 MINUTE) AS ts,
       round(sum(value::DECIMAL(12,2)) FILTER (event_type = 'click'), 6)::DOUBLE    AS click,
       round(sum(value::DECIMAL(12,2)) FILTER (event_type = 'error'), 6)::DOUBLE    AS error,
       round(sum(value::DECIMAL(12,2)) FILTER (event_type = 'purchase'), 6)::DOUBLE AS purchase,
       round(sum(value::DECIMAL(12,2)) FILTER (event_type = 'signup'), 6)::DOUBLE   AS signup,
       round(sum(value::DECIMAL(12,2)) FILTER (event_type = 'view'), 6)::DOUBLE     AS view
FROM events
GROUP BY epoch_us(ts) // 3600000000
ORDER BY ts
"""


#: exact micro-average of the 2-dp ``value`` column: (cents * 10^4)
#: div n — pure BIGINT, engine-portable. round(avg(value), 6) is
#: tie-ambiguous: the sf10 probe observed hourly means landing exactly
#: on …1875 / …8125 6th-decimal halves (avg of 2-dp decimals IS an
#: exact rational whose denominator can carry 2-adic valuation 7).
_AVG_MICRO = (
    "CASE WHEN count(value) = 0 THEN NULL"
    " ELSE (CAST(sum(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT)"
    " * 10000L) div count(value) END"
)


def daily_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: unstack-to-periods — (day x hour) matrix of mean load,
    each cell the exact integer micro-mean (see ``_AVG_MICRO``)."""
    _prep(spark)
    ev = _t(spark, sf_dir, "events")
    ev2 = ev.withColumn("__h", F.hour("ts"))
    pivoted = (
        ev2.groupBy(F.to_date("ts").alias("day"))
        .pivot("__h", list(range(24)))
        .agg(F.expr(_AVG_MICRO))
    )
    renames = {str(h): f"h{h}" for h in range(24)}
    return pivoted.withColumnsRenamed(renames).orderBy("day")


def _avg_micro_sql(filt: str) -> str:
    return (
        f"CASE WHEN count(value) FILTER ({filt}) = 0 THEN NULL"
        f" ELSE (sum(value::DECIMAL(12,2)) FILTER ({filt}) * 100)::BIGINT"
        f" * 10000 // count(value) FILTER ({filt}) END"
    )


_DAILY_PROFILE_SQL = "SELECT CAST(ts AS DATE) AS day, " + ", ".join(
    f"({_avg_micro_sql(f'EXTRACT(hour FROM ts) = {h}')})::BIGINT AS h{h}"
    for h in range(24)
) + " FROM events GROUP BY 1 ORDER BY 1"


def unstack_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 proper: tsam-style ``unstackToPeriods`` — the hourly
    micro-mean series (exact BIGINT, see ``_AVG_MICRO``) reshaped to
    one row per 24-step period by grid ordinal ((ts - min ts) / step),
    not calendar position; gaps stay null. Per-row math against a
    broadcast global min + one pivot shuffle."""
    _prep(spark)
    from energy_pandas_spark.operators.reshape import unstack_to_periods

    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("ts")).agg(
        F.expr(_AVG_MICRO).alias("v")
    )
    return unstack_to_periods(hourly, "ts", "v", 24, step_seconds=3600)


_UNSTACK_PERIODS_SQL = (
    """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS ts,
         ("""
    + _avg_micro_sql("TRUE")
    + """)::BIGINT AS v
  FROM events GROUP BY 1
), o AS (
  SELECT CAST(floor((epoch(ts) - (SELECT min(epoch(ts)) FROM hourly)) / 3600) AS BIGINT) AS ord, v
  FROM hourly
)
SELECT ord // 24 AS period, """
    + ", ".join(f"max(v) FILTER (ord % 24 = {s}) AS s{s}" for s in range(24))
    + " FROM o GROUP BY 1 ORDER BY 1"
)


def series_align_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.5 index-alignment arithmetic: two hourly series (click vs view
    mean value) outer-joined on the time index, then subtracted — the
    Spark form of pandas' implicit index alignment. The diff ships as
    the exact integer micro-quantization (tumbling_1h's idiom): the
    sf10 probe caught hour buckets whose avg difference landed on a
    6th-decimal half (…8125), where Spark's HALF_UP-of-shortest-repr
    and DuckDB's round-of-product disagree — avgs are 2-dp-decimal /
    count ratios, so ties are structurally reachable (the round-at-tie
    criterion)."""
    _prep(spark)
    ev = _t(spark, sf_dir, "events")

    def series(kind: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == kind)
            .groupBy(F.date_trunc("hour", "ts").alias("ts"))
            .agg(
                F.sum(F.col("value").cast("decimal(12,2)")).alias(
                    f"__s_{kind}"
                ),
                # count(value), not count(*): sum() skips NULLs, so the
                # divisor must too or a NULL-bearing hour silently
                # deflates the mean (ADVICE r5; both engines NULL out
                # the div-by-zero all-NULL bucket identically)
                F.count("value").alias(f"__n_{kind}"),
            )
        )

    a, b = series("click"), series("view")
    micro = (
        "(CAST(__s_click * 100 AS BIGINT) * 10000L) div __n_click"
        " - (CAST(__s_view * 100 AS BIGINT) * 10000L) div __n_view"
    )
    return (
        a.join(b, "ts", "outer")
        .select("ts", F.expr(micro).alias("diff_micro"))
        .orderBy("ts")
    )


_SERIES_ALIGN_SQL = """
WITH a AS (
  SELECT date_trunc('hour', ts) AS ts,
         (sum(value::DECIMAL(12,2)) * 100)::BIGINT AS s, count(value) AS n
  FROM events WHERE event_type = 'click' GROUP BY 1
), b AS (
  SELECT date_trunc('hour', ts) AS ts,
         (sum(value::DECIMAL(12,2)) * 100)::BIGINT AS s, count(value) AS n
  FROM events WHERE event_type = 'view' GROUP BY 1
)
SELECT COALESCE(a.ts, b.ts) AS ts,
       ((a.s * 10000 // a.n) - (b.s * 10000 // b.n))::BIGINT AS diff_micro
FROM a FULL OUTER JOIN b ON a.ts = b.ts
ORDER BY 1
"""


def asof_join_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (§2.5 north star): each event joined to the most
    recent hourly per-user average at or before it — union +
    last(ignorenulls) window, one shuffle on the key."""
    _prep(spark)
    from energy_pandas_spark.operators.joins import asof_join

    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
    hourly = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("ts"))
        .agg(F.expr(_AVG_MICRO).alias("hr_avg"))
    )
    out = asof_join(ev, hourly, on="ts", by="user_id", right_cols=["hr_avg"])
    return out.select("event_id", "user_id", "hr_avg").orderBy("event_id")


_ASOF_SQL = """
SELECT l.event_id, l.user_id, r.hr_avg
FROM events l
ASOF LEFT JOIN (
  SELECT user_id, date_trunc('hour', ts) AS ts, (CASE WHEN count(value) = 0 THEN NULL
             ELSE (sum(value::DECIMAL(12,2)) * 100)::BIGINT * 10000
                    // count(value) END)::BIGINT AS hr_avg
  FROM events GROUP BY 1, 2
) r ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY l.event_id
"""


def asof_join_tolerance_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with pandas merge_asof tolerance: matches further
    than 30 minutes behind null out. Same single-shuffle plan; the
    matched right timestamp rides the window fill."""
    _prep(spark)
    from energy_pandas_spark.operators.joins import asof_join

    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
    hourly = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("ts"))
        .agg(F.expr(_AVG_MICRO).alias("hr_avg"))
    )
    out = asof_join(
        ev,
        hourly,
        on="ts",
        by="user_id",
        right_cols=["hr_avg"],
        tolerance_seconds=1800,
    )
    return out.select("event_id", "user_id", "hr_avg").orderBy("event_id")


_ASOF_TOL_SQL = """
SELECT event_id, user_id,
       CASE WHEN r_ts IS NOT NULL
                 AND epoch_us(l_ts) - epoch_us(r_ts) <= 1800 * 1000000
            THEN hr_avg END AS hr_avg
FROM (
  SELECT l.event_id, l.user_id, l.ts AS l_ts, r.ts AS r_ts, r.hr_avg
  FROM events l
  ASOF LEFT JOIN (
    SELECT user_id, date_trunc('hour', ts) AS ts,
           (CASE WHEN count(value) = 0 THEN NULL
             ELSE (sum(value::DECIMAL(12,2)) * 100)::BIGINT * 10000
                    // count(value) END)::BIGINT AS hr_avg
    FROM events GROUP BY 1, 2
  ) r ON l.user_id = r.user_id AND l.ts >= r.ts
)
ORDER BY event_id
"""


def asof_join_broadcast_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast as-of variant: the right side packs into per-key sorted
    arrays and broadcasts, so the (huge) left side is never shuffled —
    the zero-shuffle as-of strategy for small right sides. Same oracle
    as asof_join_hourly (results are identical by construction)."""
    _prep(spark)
    from energy_pandas_spark.operators.joins import asof_join_broadcast

    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
    hourly = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("ts"))
        .agg(F.expr(_AVG_MICRO).alias("hr_avg"))
    )
    out = asof_join_broadcast(ev, hourly, on="ts", by="user_id", right_cols=["hr_avg"])
    return out.select("event_id", "user_id", "hr_avg").orderBy("event_id")


_CM_TERMS = [
    "the", "data", "quick", "lazy", "spark", "document", "energy",
    "model", "with", "zzz_absent",
]


def cm_term_counts_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min point-frequency estimates (operators/sketches.py:
    cm_sketch/cm_query — the mergeable frequency sketch completing the
    HLL/KLL/SpaceSaving/Bloom family): explode(depth) + one
    map-combined (row, col) aggregate builds the sparse counter table,
    probes broadcast. Built here with the engine-portable md5 hasher
    (cm_md5_hasher, the hash_bucket hex-prefix scheme) so the DuckDB
    oracle replays the EXACT sketch — estimates are deterministic
    integers, hash collisions included."""
    _prep(spark)
    from energy_pandas_spark.functions.textfns import tokens
    from energy_pandas_spark.operators.sketches import (
        cm_md5_hasher,
        cm_query,
        cm_sketch,
    )

    from energy_pandas_spark.util import spread_partitions

    docs = _t(spark, sf_dir, "documents")
    # _spread class (guide §2.5 input skew): the single-file scan
    # otherwise runs tokenize + 4x md5-per-token on ONE task (r7
    # profile: a 1.7s single-task stage was the query's floor)
    toks = spread_partitions(docs.select("text")).select(
        F.explode(tokens("text")).alias("term")
    )
    sk = cm_sketch(toks, "term", depth=4, width=2048, hasher=cm_md5_hasher)
    qs = spark.createDataFrame([(t,) for t in _CM_TERMS], "term string")
    return cm_query(
        sk, qs, "term", depth=4, width=2048, hasher=cm_md5_hasher
    ).orderBy("term")


_CM_TERMS_SQL = r"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x != '')) AS term
  FROM documents
), rows AS (
  SELECT unnest(range(4)) AS row
), counters AS (
  SELECT row,
         ('0x' || substr(md5(row::VARCHAR || ':' || term), 1, 15))::BIGINT
           % 2048 AS col,
         count(*)::BIGINT AS c
  FROM toks, rows GROUP BY 1, 2
), q AS (
  SELECT unnest(['the', 'data', 'quick', 'lazy', 'spark', 'document',
                 'energy', 'model', 'with', 'zzz_absent']) AS term
), probe AS (
  SELECT q.term, r.row,
         ('0x' || substr(md5(r.row::VARCHAR || ':' || q.term), 1, 15))::BIGINT
           % 2048 AS col
  FROM q, rows r
)
SELECT p.term, min(coalesce(c.c, 0))::BIGINT AS cm_est
FROM probe p LEFT JOIN counters c ON c.row = p.row AND c.col = p.col
GROUP BY p.term ORDER BY p.term
"""



def corpus_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts over the corpus (docs, terms, content
    fingerprints) — the distinct-aggregate family. The scale path for
    cardinality-only questions is ``approx_count_distinct`` (HLL, one
    pass, no distinct shuffle); the exact form here is the
    oracle-checkable contract."""
    _prep(spark)
    from energy_pandas_spark.functions.textfns import normalized_text, tokens

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.md5(normalized_text("text")).alias("fp"),
        F.explode_outer(tokens("text")).alias("term"),
    )
    return toks.agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.countDistinct("term").alias("n_terms"),
        F.countDistinct("fp").alias("n_fingerprints"),
    )


_CARDINALITY_SQL = """
SELECT count(DISTINCT doc_id) AS n_docs,
       count(DISTINCT term) AS n_terms,
       count(DISTINCT fp) AS n_fingerprints
FROM (
  -- [NULL] for token-less docs mirrors Spark's explode_outer: the doc
  -- still counts toward n_docs, the NULL term is ignored by DISTINCT
  SELECT doc_id, fp,
         unnest(CASE WHEN len(toks) = 0 THEN [NULL]::VARCHAR[] ELSE toks END)
           AS term
  FROM (
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
           list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')
             AS toks
    FROM documents
  )
)
"""


def interval_join_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: events against a broadcast calendar of
    6-hour maintenance windows."""
    _prep(spark)
    from energy_pandas_spark.operators.joins import interval_join

    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "value")
    cal = spark.sql(
        """
        SELECT w AS start, w + INTERVAL 6 HOURS AS end,
               CAST(date_format(w, 'yyyyMMddHH') AS LONG) AS window_id
        FROM (SELECT explode(sequence(TIMESTAMP '2024-01-01',
                                      TIMESTAMP '2024-01-31',
                                      INTERVAL 24 HOURS)) AS w)
        """
    )
    out = interval_join(ev, cal, ts_col="ts")
    return (
        out.groupBy("window_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(_m("value")), 6).cast("double").alias("sum_value"),
        )
        .orderBy("window_id")
    )


def interval_join_bucketed_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-bucketed interval join (the non-broadcast scale path: both
    sides key onto a time-grain lattice, one equi-join shuffle) — same
    oracle as the broadcast formulation, identical results."""
    _prep(spark)
    from energy_pandas_spark.operators.joins import interval_join_bucketed

    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "value")
    cal = spark.sql(
        """
        SELECT w AS start, w + INTERVAL 6 HOURS AS end,
               CAST(date_format(w, 'yyyyMMddHH') AS LONG) AS window_id
        FROM (SELECT explode(sequence(TIMESTAMP '2024-01-01',
                                      TIMESTAMP '2024-01-31',
                                      INTERVAL 24 HOURS)) AS w)
        """
    )
    out = interval_join_bucketed(ev, cal, ts_col="ts", grain="6 hours")
    return (
        out.groupBy("window_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(_m("value")), 6).cast("double").alias("sum_value"),
        )
        .orderBy("window_id")
    )


_INTERVAL_JOIN_SQL = """
WITH cal AS (
  SELECT w AS s, w + INTERVAL 6 HOUR AS e,
         CAST(strftime(w, '%Y%m%d%H') AS BIGINT) AS window_id
  FROM generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-31',
                       INTERVAL 24 HOUR) t(w)
)
SELECT window_id, count(*) AS n_events,
       round(sum(value::DECIMAL(12,2)), 6)::DOUBLE AS sum_value
FROM events JOIN cal ON ts >= s AND ts < e
GROUP BY 1 ORDER BY 1
"""


def rolling_1h_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour rolling average per user (RANGE frame on
    physical time, tie-deterministic). Partitioned by user_id — a key
    whose cardinality grows with the data, so no window partition
    becomes a single-task giant at scale (event_type, with 5 values,
    would)."""
    _prep(spark)
    from energy_pandas_spark.operators.windows import rolling_aggregate

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", _m("value").alias("value")
    )
    out = rolling_aggregate(
        ev, "ts", "value", 3600, by="user_id", aggs=("sum", "count")
    )
    # micro-quantized avg: a decimal-sum/count ratio can be an exact
    # decimal half where cross-engine round(,6) tie-breaking diverges
    # (the tumbling_1h sf1 precedent)
    return out.select(
        "event_id",
        F.expr(
            "(CAST(rolling_sum * 100 AS BIGINT) * 10000L) div rolling_count"
        ).alias("rolling_avg_micro"),
        F.col("rolling_count").alias("rolling_n"),
    ).orderBy("event_id")


_ROLLING_SQL = """
SELECT event_id,
       ((sum(value::DECIMAL(12,2)) OVER w * 100)::BIGINT
         * 10000 // count(value) OVER w)::BIGINT AS rolling_avg_micro,
       count(value) OVER w AS rolling_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""


def cumulative_user_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user sum over time (RANGE unbounded-preceding)."""
    _prep(spark)
    from energy_pandas_spark.operators.windows import cumulative_aggregate

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", _m("value").alias("value")
    )
    out = cumulative_aggregate(ev, "ts", "value", by="user_id")
    return out.select(
        "event_id", F.round("cum_sum", 6).cast("double").alias("cum_value")
    ).orderBy("event_id")


_CUMULATIVE_SQL = """
SELECT event_id,
       round(sum(value::DECIMAL(12,2)) OVER (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)::DOUBLE
         AS cum_value
FROM events ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# windows / sessions (streaming-equivalent semantics on the batch table)
# ---------------------------------------------------------------------------


def tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    from energy_pandas_spark.streaming.events import windowed_aggregate

    ev = _t(spark, sf_dir, "events").withColumn("value", _m("value"))
    out = windowed_aggregate(ev, "1 hour")
    # exact decimal sum (order-free across partial-agg combines); the
    # avg ships micro-quantized — the sf1 probe caught a window whose
    # exact avg was 13911.30/320 = 43.4728125, a decimal half where
    # Spark's HALF_UP round and DuckDB's ties-to-even disagree
    return out.select(
        "window_start",
        "event_type",
        "n_events",
        F.round("sum_value", 6).cast("double").alias("sum_value"),
        F.expr(
            "(CAST(sum_value * 100 AS BIGINT) * 10000L) div n_events"
        ).alias("avg_value_micro"),
    ).orderBy("window_start", "event_type")


_TUMBLING_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       round(sum(value::DECIMAL(12,2)), 6)::DOUBLE AS sum_value,
       ((sum(value::DECIMAL(12,2)) * 100)::BIGINT * 10000 // count(*))::BIGINT
         AS avg_value_micro
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def sliding_2h_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("window_start"), "n_events")
        .orderBy("window_start")
    )


_SLIDING_SQL = """
SELECT ws AS window_start, count(*) AS n_events
FROM (
  SELECT date_trunc('hour', ts) AS ws FROM events
  UNION ALL
  SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR FROM events
)
GROUP BY 1 ORDER BY 1
"""


def dedup_bursts_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry burst dedup (operators/analytics.py:dedup_bursts):
    per (user, event_type), gap-chained bursts at 2-minute tolerance
    keep only their first event — session_window AGGREGATE + min_by
    survivor, never a per-key lag window."""
    _prep(spark)
    from energy_pandas_spark.operators.analytics import dedup_bursts

    ev = _t(spark, sf_dir, "events")
    return dedup_bursts(ev, tolerance="2 minutes").select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).orderBy("event_id")


_DEDUP_BURSTS_SQL = """
WITH marked AS (
  SELECT event_id, ts, user_id, event_type, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 2 MINUTE
              THEN 1 ELSE 0 END AS new_burst
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
), numbered AS (
  SELECT *, sum(new_burst) OVER (PARTITION BY user_id, event_type
             ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS burst_id
  FROM marked
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type, burst_id
             ORDER BY ts, event_id) AS rn
  FROM numbered
)
SELECT event_id, ts, user_id, event_type, value
FROM ranked WHERE rn = 1
ORDER BY event_id
"""


def sessionize_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions per user (session_window); verified against a
    lag/cumulative-sum SQL formulation."""
    _prep(spark)
    from energy_pandas_spark.streaming.events import sessionize

    ev = _t(spark, sf_dir, "events").withColumn("value", _m("value"))
    out = sessionize(ev, "30 minutes")
    return out.select(
        "session_start",
        "user_id",
        "n_events",
        F.round("sum_value", 6).cast("double").alias("sum_value"),
    ).orderBy("user_id", "session_start")


_SESSIONIZE_SQL = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT min(ts) AS session_start, user_id,
       count(*) AS n_events,
       round(sum(value::DECIMAL(12,2)), 6)::DOUBLE AS sum_value
FROM numbered GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""


def users_view_no_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops: distinct viewers EXCEPT purchasers."""
    _prep(spark)
    ev = _t(spark, sf_dir, "events")
    viewers = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return viewers.exceptAll(buyers).orderBy("user_id")


_EXCEPT_SQL = """
SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
EXCEPT
SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
ORDER BY user_id
"""


def salted_join_priority_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-guard join: lineitem joined to orders through salted_join
    (hot orderkeys spread across `salt` shuffle partitions), then
    revenue per order priority — results identical to the plain join,
    which is exactly what the oracle asserts."""
    _prep(spark)
    from energy_pandas_spark.operators.joins import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, orders, on="l_orderkey", salt=4)
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(_rev()), 2).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("o_orderpriority")
    )


_SALTED_JOIN_SQL = """
SELECT o_orderpriority,
       round(sum(l_extendedprice::DECIMAL(12,2)
                 * (1 - l_discount)::DECIMAL(4,2)), 2)::DOUBLE AS revenue,
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1
"""


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles of value per event type
    (Spark ``percentile`` == DuckDB ``quantile_cont``). The scale path
    swaps in ``percentile_approx`` (t-digest sketch, mergeable across
    partitions) when exactness isn't required."""
    _prep(spark)
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


_PERCENTILES_SQL = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6)  AS p50,
       round(quantile_cont(value, 0.9), 6)  AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY 1 ORDER BY 1
"""


def props_key_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured path: parse the props JSON column with a typed
    schema (from_json — codegen'd Jackson parse, no UDF) and histogram
    the k attribute per event type."""
    _prep(spark)
    ev = _t(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type", F.from_json("props", "k int").alias("p")
    )
    return (
        parsed.groupBy("event_type", F.col("p.k").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "k")
    )


_PROPS_HIST_SQL = """
SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k,
       count(*) AS n
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components (iterative min-label propagation) over the
    bipartite user <-> props.k graph from events — the entity-resolution
    / dedup-cluster primitive. Attribute nodes are offset by 1e6 to
    keep the id spaces disjoint."""
    _prep(spark)
    from energy_pandas_spark.operators.graph import connected_components

    ev = _t(spark, sf_dir, "events")
    edges = ev.select(
        F.col("user_id").alias("src"),
        (F.get_json_object("props", "$.k").cast("long") + F.lit(1_000_000)).alias(
            "dst"
        ),
    ).where(F.col("dst").isNotNull())
    return connected_components(edges).orderBy("id")


_GRAPH_CC_SQL = """
WITH RECURSIVE edges AS (
  SELECT user_id AS u, CAST(json_extract_string(props, '$.k') AS BIGINT) + 1000000 AS v
  FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
), sym AS (
  SELECT u, v FROM edges UNION SELECT v, u FROM edges
), cc(id, label) AS (
  SELECT DISTINCT u, u FROM sym
  UNION
  SELECT s.v, cc.label FROM cc JOIN sym s ON cc.id = s.u
)
SELECT id, min(label) AS component FROM cc GROUP BY id ORDER BY id
"""


# ---------------------------------------------------------------------------
# text analysis over documents
# ---------------------------------------------------------------------------


def doc_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    from energy_pandas_spark.operators.text import token_count

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", token_count("text").alias("n_tokens")).orderBy(
        "doc_id"
    )


def doc_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-flavored subword count estimate (letter/digit boundary split,
    long words ~len/4 subwords) — one regex + aggregate expression."""
    _prep(spark)
    from energy_pandas_spark.operators.text import bpe_ish_token_count

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", bpe_ish_token_count("text").alias("n_bpe_tokens")
    ).orderBy("doc_id")


_BPE_TOKENS_SQL = r"""
SELECT doc_id,
       CAST(coalesce(list_sum(list_transform(
         list_filter(string_split_regex(lower(text), '[^\pL\pN]+'), x -> x != ''),
         w -> CASE WHEN length(w) <= 4 THEN 1
                   ELSE CAST(ceil(length(w) / 4.0) AS BIGINT) END)), 0) AS BIGINT)
         AS n_bpe_tokens
FROM documents ORDER BY doc_id
"""


def doc_min_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-flavored rolling fingerprint (operators/text.py:
    minhash_fingerprint): min hash over char 5-shingles of the
    normalized text. Uses the engine-portable md5 hasher so the DuckDB
    oracle replays the fingerprint bit-for-bit (the cm/hll hash-gate
    idiom) — promoted from rows-only in r5 (VERDICT r4 #6)."""
    _prep(spark)
    from energy_pandas_spark.operators.text import minhash_fingerprint

    docs = _t(spark, sf_dir, "documents")
    return (
        minhash_fingerprint(docs, hasher="md5")
        .select("doc_id", "min_fp")
        .orderBy("doc_id")
    )


_TOKEN_COUNT_SQL = """
SELECT doc_id,
       len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x != ''))
         AS n_tokens
FROM documents ORDER BY doc_id
"""


def doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features: char/token counts + alpha/punct ratios (all
    regex + array expressions)."""
    _prep(spark)
    docs = _t(spark, sf_dir, "documents")
    t = F.col("text")
    n_chars = F.length(t)
    safe = F.when(n_chars == 0, 1).otherwise(n_chars).cast("double")
    toks = F.filter(F.split(F.lower(t), r"\s+"), lambda x: x != F.lit(""))
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars_calc"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(F.length(F.regexp_replace(t, r"[^\p{L}]", "")) / safe, 6).alias(
            "alpha_ratio"
        ),
        F.round(F.length(F.regexp_replace(t, r"\p{L}|\p{N}|\s", "")) / safe, 6).alias(
            "symbol_ratio"
        ),
    ).orderBy("doc_id")


_DOC_QUALITY_SQL = """
SELECT doc_id,
       length(text) AS n_chars_calc,
       len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')) AS n_tokens,
       round(length(regexp_replace(text, '[^\\p{L}]', '', 'g'))
             / CAST(CASE WHEN length(text) = 0 THEN 1 ELSE length(text) END AS DOUBLE), 6)
         AS alpha_ratio,
       round(length(regexp_replace(text, '\\p{L}|\\p{N}|\\s', '', 'g'))
             / CAST(CASE WHEN length(text) = 0 THEN 1 ELSE length(text) END AS DOUBLE), 6)
         AS symbol_ratio
FROM documents ORDER BY doc_id
"""


def lang_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs")).orderBy("lang")


_LANG_DIST_SQL = """
SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1 ORDER BY 1
"""


def langid_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID (deterministic expression vote, so it
    has a full DuckDB oracle: same token sets, same intersect counts,
    same first-language tie-break)."""
    _prep(spark)
    from energy_pandas_spark.operators.text import language_id

    docs = _t(spark, sf_dir, "documents")
    return language_id(docs).select("doc_id", "lang", "lang_pred").orderBy("doc_id")


def _langid_vote_sql() -> tuple[str, str]:
    """(vote-columns select fragment over ``toks``/``chars``, CASE
    expression over the ``s_<lang>`` vote columns) — shared by the
    langid and clean-corpus oracles so both replicate the engine's
    first-language tie-break exactly."""
    from energy_pandas_spark.operators.text import STOPWORDS

    def lst(words):
        return "[" + ", ".join(f"'{w}'" for w in words) + "]"

    votes = ",\n         ".join(
        f"len(list_intersect(toks, {lst(ws)})) AS s_{lang}"
        for lang, ws in STOPWORDS.items()
        if lang != "zh"
    )
    votes += f",\n         len(list_intersect(chars, {lst(STOPWORDS['zh'])})) AS s_zh"
    langs = list(STOPWORDS)
    case = "\n    ".join(
        f"WHEN s_{lang} > 0 AND s_{lang} >= greatest("
        + ", ".join(f"s_{o}" for o in langs if o != lang)
        + f") THEN '{lang}'"
        for lang in langs
    )
    case = f"CASE\n    {case}\n    ELSE 'und'\n  END"
    return votes, case


def _langid_sql() -> str:
    votes, case = _langid_vote_sql()
    return f"""
WITH t AS (
  SELECT doc_id, lang,
         list_distinct(list_filter(string_split_regex(lower(text), '\\s+'),
                                   x -> x != '')) AS toks,
         string_split(text, '') AS chars
  FROM documents
), s AS (
  SELECT doc_id, lang,
         {votes}
  FROM t
)
SELECT doc_id, lang,
  {case} AS lang_pred
FROM s ORDER BY doc_id
"""


def collocations_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 PMI collocations (operators/text.py:collocations): one
    bigram aggregate, vocabulary-sized marginals, integer-quantized
    PMI (DSIR's 1/1024-nat pattern, 1-ulp ln caveat)."""
    _prep(spark)
    from energy_pandas_spark.operators.text import collocations

    docs = _t(spark, sf_dir, "documents")
    return collocations(docs, top=50, min_count=5).orderBy("rank")


_COLLOCATIONS_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     x -> x != '') AS t
  FROM documents
), bg AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i)
), cnt AS (
  SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2
), c1 AS (SELECT w1, sum(c12) AS c1 FROM cnt GROUP BY 1),
c2 AS (SELECT w2, sum(c12) AS c2 FROM cnt GROUP BY 1),
tt AS (SELECT sum(c12) AS T FROM cnt),
scored AS (
  SELECT cnt.w1, cnt.w2, cnt.c12,
         round(1024.0 * ln((cnt.c12::DOUBLE * tt.T) / (c1.c1 * c2.c2)))::BIGINT
           AS pmi_q
  FROM cnt
  JOIN c1 ON c1.w1 = cnt.w1
  JOIN c2 ON c2.w2 = cnt.w2
  CROSS JOIN tt
  WHERE cnt.c12 >= 5
), ranked AS (
  SELECT w1, w2, c12::BIGINT AS c12, pmi_q,
         row_number() OVER (ORDER BY pmi_q DESC, w1, w2) AS rank
  FROM scored
)
SELECT w1, w2, c12, pmi_q, rank::INT AS rank
FROM ranked WHERE rank <= 50 ORDER BY rank
"""


def textrank_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 TextRank keywords (operators/text.py:textrank_keywords):
    PageRank over the window=2 word co-occurrence graph, run in PURE
    INTEGER arithmetic (ranks are 2^40-scaled longs, damping = the
    rational 17/20), so the distributed fixed-iteration result is
    bit-identical to the oracle's SQL replay of the same iteration —
    no float-sum ordering caveat anywhere."""
    _prep(spark)
    from energy_pandas_spark.operators.text import textrank_keywords

    docs = _t(spark, sf_dir, "documents")
    return textrank_keywords(docs, top=20, n_iter=10).orderBy("rank")


def epoch_order_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 2-epoch training-order manifest (operators/
    sampling.py:epoch_order): per-epoch md5(seed:epoch:id)-keyed
    permutations with contiguous positions, assigned by the
    distributed-rank machinery (range partition + per-partition
    monotonic ids + broadcast cumulative offsets) — no
    single-partition window anywhere."""
    _prep(spark)
    from energy_pandas_spark.operators.sampling import epoch_order

    docs = _t(spark, sf_dir, "documents")
    return epoch_order(docs, epochs=2, seed="s0").orderBy(
        "epoch", "position"
    )


_EPOCH_ORDER_SQL = r"""
WITH e AS (SELECT unnest(range(0, 2)) AS epoch),
k AS (
  SELECT e.epoch, d.doc_id,
         md5('s0:' || e.epoch::VARCHAR || ':' || d.doc_id::VARCHAR) AS key
  FROM documents d CROSS JOIN e
)
SELECT epoch::INT AS epoch,
       (row_number() OVER (PARTITION BY epoch ORDER BY key, doc_id) - 1)::BIGINT
         AS position,
       doc_id
FROM k ORDER BY epoch, position
"""


def _textrank_sql(top: int = 20, n_iter: int = 10) -> str:
    """Generate the oracle: the SAME integer PageRank iteration as
    operators/graph.py:pagerank, unrolled into one CTE per round
    (scale 2^40, damping 17/20, teleport term 3*(scale//n)).
    Every op is an integer multiply / floor-divide / sum, so the replay
    is exact, not approximate."""
    scale = 1 << 40
    its = []
    prev = "r0"
    for k in range(1, n_iter + 1):
        its.append(
            f"""r{k} AS (
  SELECT d.u,
         ((3 * ({scale} // nstat.n) + 17 * coalesce(s.s, 0)) // 20)::BIGINT AS r
  FROM deg d CROSS JOIN nstat
  LEFT JOIN (
    SELECT e.v AS u, sum(rp.r // dd.d)::BIGINT AS s
    FROM edges e
    JOIN {prev} rp ON rp.u = e.u
    JOIN deg dd ON dd.u = e.u
    GROUP BY e.v
  ) s ON s.u = d.u
)"""
        )
        prev = f"r{k}"
    iter_ctes = ",\n".join(its)
    return rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     x -> x != '') AS t
  FROM documents
), bg AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i)
), und AS (
  SELECT least(w1, w2) AS u, greatest(w1, w2) AS v
  FROM bg WHERE w1 <> w2 GROUP BY 1, 2
), edges AS (
  SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und
), deg AS (
  SELECT u, count(*)::BIGINT AS d FROM edges GROUP BY 1
), nstat AS (
  SELECT count(*)::BIGINT AS n FROM deg
), r0 AS (
  SELECT u, ({scale} // nstat.n)::BIGINT AS r FROM deg CROSS JOIN nstat
),
{iter_ctes},
ranked AS (
  SELECT u AS term, r AS rank_q,
         row_number() OVER (ORDER BY r DESC, u) AS rank
  FROM {prev}
)
SELECT term, rank_q, rank::INT AS rank
FROM ranked WHERE rank <= {top} ORDER BY rank
"""


def seasonal_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of the hourly per-type series
    (operators/analytics.py:seasonal_decompose): hourly means, the
    centered 24h moving trend, hour-of-day seasonal component and
    residual — every mean over integer-quantized values, so the
    decomposition is bit-exact cross-engine."""
    _prep(spark)
    from energy_pandas_spark.operators.analytics import seasonal_decompose

    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        (
            F.sum(F.round(F.lit(1e6) * F.col("value")).cast("long")).cast(
                "double"
            )
            / (F.lit(1_000_000) * F.count(F.lit(1))).cast("double")
        ).alias("hourly")
    )
    return seasonal_decompose(
        hourly, "h", "hourly", by="event_type", period=24, trend_window=24
    ).orderBy("event_type", "h")


_SEASONAL_SQL = r"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         sum(round(1000000.0 * value))::BIGINT AS sq, count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2
), hv AS (
  SELECT event_type, h, sq::DOUBLE / (1000000 * c)::DOUBLE AS hourly
  FROM hourly
), q AS (
  SELECT *, round(1000000.0 * hourly)::BIGINT AS vq FROM hv
), tr AS (
  SELECT event_type, h, hourly,
         sum(vq) OVER w AS swq, count(*) OVER w AS cw
  FROM q
  WINDOW w AS (PARTITION BY event_type ORDER BY h
               ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING)
), t2 AS (
  SELECT event_type, h, hourly,
         swq::DOUBLE / (1000000 * cw)::DOUBLE AS trend
  FROM tr
), s1 AS (
  SELECT *, round(1000000.0 * (hourly - trend))::BIGINT AS dq,
         hour(h) % 24 AS phase
  FROM t2
), se AS (
  SELECT event_type, phase, sum(dq)::BIGINT AS ss, count(*)::BIGINT AS cs
  FROM s1 GROUP BY 1, 2
)
SELECT s1.event_type, s1.h, s1.hourly, s1.trend,
       se.ss::DOUBLE / (1000000 * se.cs)::DOUBLE AS seasonal,
       s1.hourly - s1.trend
         - (se.ss::DOUBLE / (1000000 * se.cs)::DOUBLE) AS residual
FROM s1 JOIN se ON se.event_type = s1.event_type AND se.phase = s1.phase
ORDER BY s1.event_type, s1.h
"""


def seasonal_backtest_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest over the hourly per-type
    series (operators/analytics.py:seasonal_naive_backtest): lag-24
    prediction, integer-quantized MAE / per-mille MAPE — the baseline
    every forecaster must beat."""
    _prep(spark)
    from energy_pandas_spark.operators.analytics import (
        seasonal_naive_backtest,
    )

    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        (
            F.sum(F.round(F.lit(1e6) * F.col("value")).cast("long")).cast(
                "double"
            )
            / (F.lit(1_000_000) * F.count(F.lit(1))).cast("double")
        ).alias("hourly")
    )
    return seasonal_naive_backtest(
        hourly, "h", "hourly", by="event_type", period=24
    ).orderBy("event_type")


_SEASONAL_BACKTEST_SQL = r"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         sum(round(1000000.0 * value))::BIGINT AS sq, count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2
), hv AS (
  SELECT event_type, h, sq::DOUBLE / (1000000 * c)::DOUBLE AS v FROM hourly
), lagged AS (
  SELECT event_type, v,
         lag(v, 24) OVER (PARTITION BY event_type ORDER BY h) AS p
  FROM hv
), scored AS (
  SELECT event_type, v, p,
         round(1000000.0 * abs(v - p))::BIGINT AS aerr,
         CASE WHEN v != 0
              THEN round(1000000.0 * abs((v - p) / v))::BIGINT END AS ape
  FROM lagged WHERE p IS NOT NULL
)
SELECT event_type,
       count(*)::BIGINT AS n,
       sum(aerr)::DOUBLE / (1000000 * count(*))::DOUBLE AS mae,
       (1000 * sum(ape))::DOUBLE / (1000000 * count(ape))::DOUBLE AS mape_pm
FROM scored GROUP BY event_type ORDER BY event_type
"""


def cusum_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM level-shift alarms over the hourly per-type series
    (operators/analytics.py:cusum_alarms): the sequential recurrence
    via its prefix-sum closed form — two exact integer ordered
    windows, no recursion."""
    _prep(spark)
    from energy_pandas_spark.operators.analytics import cusum_alarms

    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        (
            F.sum(F.round(F.lit(1e6) * F.col("value")).cast("long")).cast(
                "double"
            )
            / (F.lit(1_000_000) * F.count(F.lit(1))).cast("double")
        ).alias("hourly")
    )
    return cusum_alarms(
        hourly, "h", "hourly", by="event_type", target=50.0, threshold=100.0
    ).orderBy("event_type", "h")


_CUSUM_SQL = r"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         sum(round(1000000.0 * value))::BIGINT AS sq, count(*)::BIGINT AS c
  FROM events GROUP BY 1, 2
), hv AS (
  SELECT event_type, h, sq::DOUBLE / (1000000 * c)::DOUBLE AS v FROM hourly
), d AS (
  SELECT event_type, h, v,
         round(1000000.0 * v)::BIGINT - 50000000 AS dq
  FROM hv
), p1 AS (
  SELECT event_type, h, v,
         sum(dq) OVER (PARTITION BY event_type ORDER BY h
                       ROWS UNBOUNDED PRECEDING) AS P
  FROM d
), p2 AS (
  SELECT *, min(P) OVER (PARTITION BY event_type ORDER BY h
                         ROWS UNBOUNDED PRECEDING) AS M
  FROM p1
)
SELECT event_type, h, v AS hourly,
       (P - least(M, 0))::DOUBLE / 1000000.0 AS cusum,
       (P - least(M, 0)) >= 100000000 AS alarm
FROM p2 ORDER BY event_type, h
"""


def rfm_users_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM user segmentation (operators/behavior.py:rfm_segments):
    integer-quantized monetary sums, deterministic rank quintiles
    (5 - (5*rank0) div n) from the distributed-rank helper — no ntile
    window, no float boundaries."""
    _prep(spark)
    from energy_pandas_spark.operators.behavior import rfm_segments

    ev = _t(spark, sf_dir, "events")
    return rfm_segments(ev).orderBy("user_id")


_RFM_SQL = r"""
WITH per AS (
  SELECT user_id, max(ts) AS last_ts, count(*)::BIGINT AS frequency,
         sum(round(100.0 * value))::BIGINT AS monetary_q
  FROM events GROUP BY 1
), ref AS (
  SELECT max(ts) AS ref_ts FROM events
), n AS (
  SELECT count(*)::BIGINT AS n FROM per
), base AS (
  SELECT user_id,
         date_diff('day', last_ts::DATE, ref.ref_ts::DATE)::INT
           AS recency_days,
         frequency, monetary_q, last_ts
  FROM per CROSS JOIN ref
), rr AS (
  SELECT user_id,
         row_number() OVER (ORDER BY last_ts DESC, user_id) - 1 AS r0
  FROM base
), fr AS (
  SELECT user_id,
         row_number() OVER (ORDER BY frequency DESC, user_id) - 1 AS f0
  FROM base
), mr AS (
  SELECT user_id,
         row_number() OVER (ORDER BY monetary_q DESC, user_id) - 1 AS m0
  FROM base
)
SELECT b.user_id, b.recency_days, b.frequency, b.monetary_q,
       (5 - (5 * r0) // n.n)::INT AS r,
       (5 - (5 * f0) // n.n)::INT AS f,
       (5 - (5 * m0) // n.n)::INT AS m,
       ((5 - (5 * r0) // n.n) * 100 + (5 - (5 * f0) // n.n) * 10
         + (5 - (5 * m0) // n.n))::INT AS segment
FROM base b
JOIN rr USING (user_id) JOIN fr USING (user_id) JOIN mr USING (user_id)
CROSS JOIN n
ORDER BY user_id
"""


def event_graph_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavior-graph PageRank (operators/graph.py:pagerank, WEIGHTED
    path): per-user event-type transition counts form a directed
    weighted graph; the integer iteration ranks event types by
    transition structure (which states do user journeys funnel into?).
    Types never appearing as a predecessor are dangling — their mass
    damps away, identically in the oracle replay."""
    _prep(spark)
    from pyspark.sql import Window

    from energy_pandas_spark.operators.graph import pagerank

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seqs = ev.select(
        F.col("event_type").alias("v"),
        F.lag("event_type").over(w).alias("u"),
    ).filter(F.col("u").isNotNull())
    edges = seqs.groupBy("u", "v").agg(F.count(F.lit(1)).alias("w"))
    ranks = pagerank(edges, src="u", dst="v", weight="w", n_iter=10)
    return ranks.select(
        F.col("id").alias("event_type"), "rank_q"
    ).orderBy(F.desc("rank_q"), "event_type")


def _event_graph_rank_sql(n_iter: int = 10) -> str:
    """Oracle: weighted variant of _textrank_sql — contributions are
    (r * w) // out_weight, same unrolled integer iteration."""
    scale = 1 << 40
    its = []
    prev = "r0"
    for k in range(1, n_iter + 1):
        its.append(
            f"""r{k} AS (
  SELECT nd.u,
         ((3 * ({scale} // nstat.n) + 17 * coalesce(s.s, 0)) // 20)::BIGINT
           AS r
  FROM nodes nd CROSS JOIN nstat
  LEFT JOIN (
    SELECT e.v AS u, sum((rp.r * e.w) // ow.ow)::BIGINT AS s
    FROM e
    JOIN {prev} rp ON rp.u = e.u
    JOIN outw ow ON ow.u = e.u
    GROUP BY e.v
  ) s ON s.u = nd.u
)"""
        )
        prev = f"r{k}"
    iter_ctes = ",\n".join(its)
    return rf"""
WITH seqs AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev
  FROM events
), e AS (
  SELECT prev AS u, event_type AS v, count(*)::BIGINT AS w
  FROM seqs WHERE prev IS NOT NULL GROUP BY 1, 2
), outw AS (
  SELECT u, sum(w)::BIGINT AS ow FROM e GROUP BY 1
), nodes AS (
  SELECT DISTINCT u FROM (SELECT u FROM e UNION ALL SELECT v AS u FROM e)
), nstat AS (
  SELECT count(*)::BIGINT AS n FROM nodes
), r0 AS (
  SELECT u, ({scale} // nstat.n)::BIGINT AS r FROM nodes CROSS JOIN nstat
),
{iter_ctes}
SELECT u AS event_type, r AS rank_q
FROM {prev} ORDER BY rank_q DESC, event_type
"""


def js_divergence_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between source unigram
    distributions (operators/text.py:js_divergence_matrix): per-term
    quantized entropy contributions, union-aggregate pair expansion,
    pure integer js_q."""
    _prep(spark)
    from energy_pandas_spark.operators.text import js_divergence_matrix

    docs = _t(spark, sf_dir, "documents")
    return js_divergence_matrix(docs).orderBy("src_a", "src_b")


_JS_DIVERGENCE_SQL = r"""
WITH toks AS (
  SELECT source,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     x -> x != '') AS t
  FROM documents
), counts AS (
  SELECT source AS g, term, count(*)::BIGINT AS c
  FROM (SELECT source, unnest(t) AS term FROM toks)
  GROUP BY 1, 2
), totals AS (
  SELECT g, sum(c)::BIGINT AS t FROM counts GROUP BY 1
), ct AS (
  SELECT counts.g, term, c, t FROM counts JOIN totals USING (g)
), hq AS (
  SELECT g,
         (-sum(round(1048576.0 * (c::DOUBLE / t::DOUBLE)
                     * ln(c::DOUBLE / t::DOUBLE))::BIGINT))::BIGINT AS h
  FROM ct GROUP BY 1
), pairs AS (
  SELECT a.g AS sa, a.t AS ta, b.g AS sb, b.t AS tb
  FROM totals a CROSS JOIN totals b WHERE a.g < b.g
), side AS (
  SELECT p.sa, p.sb, ct.term, ct.c AS ca, 0::BIGINT AS cb, p.ta, p.tb
  FROM pairs p JOIN ct ON ct.g = p.sa
  UNION ALL
  SELECT p.sa, p.sb, ct.term, 0::BIGINT AS ca, ct.c AS cb, p.ta, p.tb
  FROM pairs p JOIN ct ON ct.g = p.sb
), merged AS (
  SELECT sa, sb, term, sum(ca)::BIGINT AS ca, sum(cb)::BIGINT AS cb,
         max(ta) AS ta, max(tb) AS tb
  FROM side GROUP BY 1, 2, 3
), hm AS (
  SELECT sa, sb,
         (-sum(round(1048576.0 * pm * ln(pm))::BIGINT))::BIGINT AS hm
  FROM (
    SELECT sa, sb,
           ca::DOUBLE / (2 * ta)::DOUBLE + cb::DOUBLE / (2 * tb)::DOUBLE AS pm
    FROM merged
  ) GROUP BY 1, 2
)
SELECT hm.sa AS src_a, hm.sb AS src_b,
       (hm.hm - (ha.h + hb.h) // 2)::BIGINT AS js_q,
       ((hm.hm - (ha.h + hb.h) // 2)::DOUBLE / 1048576.0) AS js
FROM hm
JOIN hq ha ON ha.g = hm.sa
JOIN hq hb ON hb.g = hm.sb
ORDER BY src_a, src_b
"""


def acf_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of the hourly event-count series (operators/
    analytics.py:autocorrelation): the seasonality fingerprint — a
    daily cycle peaks at lag 24."""
    _prep(spark)
    from energy_pandas_spark.operators.analytics import autocorrelation

    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("double").alias("v")
    )
    return autocorrelation(hourly, "h", "v", max_lag=30).orderBy("lag")


def _acf_sql(max_lag: int = 30) -> str:
    """Oracle: the a==b specialization of _ccf_sql over hourly counts,
    non-negative lags only."""
    parts = []
    for k in range(0, max_lag + 1):
        parts.append(
            f"SELECT aq, lead(aq, {k}) OVER (ORDER BY h) AS bv, {k} AS lag"
            " FROM base"
        )
    union = "\nUNION ALL\n".join(parts)
    return rf"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, count(*)::BIGINT AS c
  FROM events GROUP BY 1
), base AS (
  SELECT h, round(1048576.0 * c::DOUBLE)::BIGINT AS aq FROM hourly
), long AS (
{union}
), agg AS (
  SELECT lag, count(*)::HUGEINT AS n,
         sum(aq)::HUGEINT AS sa, sum(bv)::HUGEINT AS sb,
         sum(aq::HUGEINT * bv::HUGEINT) AS sab,
         sum(aq::HUGEINT * aq::HUGEINT) AS saa,
         sum(bv::HUGEINT * bv::HUGEINT) AS sbb
  FROM long WHERE bv IS NOT NULL GROUP BY lag
)
SELECT lag::INT AS lag, n::BIGINT AS n,
       CASE WHEN (sqrt((n * saa - sa * sa)::DOUBLE)
                  * sqrt((n * sbb - sb * sb)::DOUBLE)) != 0
            THEN (n * sab - sa * sb)::DOUBLE
                 / (sqrt((n * saa - sa * sa)::DOUBLE)
                    * sqrt((n * sbb - sb * sb)::DOUBLE))
       END AS r
FROM agg ORDER BY lag
"""


def ccf_click_error_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation of hourly click vs error value means
    (operators/analytics.py:cross_correlation): exact quantized sums
    per lag, correctly-rounded sqrt/divisions — the lead/lag
    diagnostic."""
    _prep(spark)
    from energy_pandas_spark.operators.analytics import cross_correlation

    ev = _t(spark, sf_dir, "events")
    q = F.round(F.lit(1e6) * F.col("value")).cast("long")
    hourly = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(
            (
                F.sum(F.when(F.col("event_type") == "click", q)).cast("double")
                / (
                    F.lit(1_000_000)
                    * F.count(F.when(F.col("event_type") == "click", 1))
                ).cast("double")
            ).alias("a"),
            (
                F.sum(F.when(F.col("event_type") == "error", q)).cast("double")
                / (
                    F.lit(1_000_000)
                    * F.count(F.when(F.col("event_type") == "error", 1))
                ).cast("double")
            ).alias("b"),
        )
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
    )
    return cross_correlation(hourly, "h", "a", "b", max_lag=6).orderBy("lag")


def _ccf_sql(max_lag: int = 6) -> str:
    """Oracle: per-lag shifted selects unioned, HUGEINT sums, the same
    correctly-rounded r formula."""
    parts = []
    for k in range(-max_lag, max_lag + 1):
        shift = f"lead(bq, {k})" if k >= 0 else f"lag(bq, {-k})"
        parts.append(
            f"SELECT aq, {shift} OVER (ORDER BY h) AS bv, {k} AS lag FROM base"
        )
    union = "\nUNION ALL\n".join(parts)
    return rf"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h,
         sum(CASE WHEN event_type = 'click'
                  THEN round(1000000.0 * value)::BIGINT END)::DOUBLE
           / (1000000 * count(CASE WHEN event_type = 'click' THEN 1 END))::DOUBLE
           AS a,
         sum(CASE WHEN event_type = 'error'
                  THEN round(1000000.0 * value)::BIGINT END)::DOUBLE
           / (1000000 * count(CASE WHEN event_type = 'error' THEN 1 END))::DOUBLE
           AS b
  FROM events GROUP BY 1
), base AS (
  SELECT h,
         round(1048576.0 * a)::BIGINT AS aq,
         round(1048576.0 * b)::BIGINT AS bq
  FROM hourly WHERE a IS NOT NULL AND b IS NOT NULL
), long AS (
{union}
), agg AS (
  SELECT lag, count(*)::HUGEINT AS n,
         sum(aq)::HUGEINT AS sa, sum(bv)::HUGEINT AS sb,
         sum(aq::HUGEINT * bv::HUGEINT) AS sab,
         sum(aq::HUGEINT * aq::HUGEINT) AS saa,
         sum(bv::HUGEINT * bv::HUGEINT) AS sbb
  FROM long WHERE bv IS NOT NULL GROUP BY lag
)
SELECT lag::INT AS lag, n::BIGINT AS n,
       CASE WHEN (sqrt((n * saa - sa * sa)::DOUBLE)
                  * sqrt((n * sbb - sb * sb)::DOUBLE)) != 0
            THEN (n * sab - sa * sb)::DOUBLE
                 / (sqrt((n * saa - sa * sa)::DOUBLE)
                    * sqrt((n * sbb - sb * sb)::DOUBLE))
       END AS r
FROM agg ORDER BY lag
"""


def trimmed_mean_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type 5%-trimmed mean of event values (operators/
    analytics.py:trimmed_mean): deterministic count-based trim,
    quantized kept-value sums, one division."""
    _prep(spark)
    from energy_pandas_spark.operators.analytics import trimmed_mean

    ev = _t(spark, sf_dir, "events")
    return trimmed_mean(ev, "value", by="event_type", trim_permille=50).orderBy(
        "event_type"
    )


_TRIMMED_MEAN_SQL = r"""
WITH base AS (
  SELECT event_type, value AS v FROM events WHERE value IS NOT NULL
), ranked AS (
  SELECT event_type, v,
         row_number() OVER (PARTITION BY event_type ORDER BY v) - 1 AS r,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM base
), kept AS (
  SELECT * FROM ranked
  WHERE r >= (n * 50) // 1000 AND r < n - (n * 50) // 1000
)
SELECT event_type,
       max(n)::BIGINT AS n,
       count(*)::BIGINT AS n_kept,
       sum(round(1000000.0 * v)::BIGINT)::DOUBLE
         / (1000000 * count(*))::DOUBLE AS trimmed_mean
FROM kept GROUP BY event_type ORDER BY event_type
"""


def chi2_type_hour_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence of event_type vs hour-of-day
    (operators/analytics.py:chi_square_independence): full marginal
    grid including zero-observed cells, quantized per-cell terms,
    order-free integer sum."""
    _prep(spark)
    from energy_pandas_spark.operators.analytics import (
        chi_square_independence,
    )

    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").cast("string").alias("hod")
    )
    return chi_square_independence(ev, "event_type", "hod")


_CHI2_SQL = r"""
WITH src AS (
  SELECT event_type AS a, hour(ts)::VARCHAR AS b FROM events
), cells AS (
  SELECT a, b, count(*)::BIGINT AS o FROM src GROUP BY 1, 2
), ra AS (
  SELECT a, sum(o)::BIGINT AS ra FROM cells GROUP BY 1
), cb AS (
  SELECT b, sum(o)::BIGINT AS cb FROM cells GROUP BY 1
), tot AS (
  SELECT sum(o)::BIGINT AS n FROM cells
), grid AS (
  SELECT ra.a, cb.b, ra.ra, cb.cb, coalesce(cells.o, 0)::BIGINT AS o
  FROM ra CROSS JOIN cb
  LEFT JOIN cells ON cells.a = ra.a AND cells.b = cb.b
), contrib AS (
  SELECT round(1000000.0
               * ((o::DOUBLE - (ra * cb)::DOUBLE / tot.n::DOUBLE)
                  * (o::DOUBLE - (ra * cb)::DOUBLE / tot.n::DOUBLE))
               / ((ra * cb)::DOUBLE / tot.n::DOUBLE))::BIGINT AS cq
  FROM grid CROSS JOIN tot
)
SELECT (SELECT count(*) FROM src)::BIGINT AS n,
       (SELECT count(*) FROM ra)::BIGINT AS n_a,
       (SELECT count(*) FROM cb)::BIGINT AS n_b,
       ((SELECT count(*) FROM ra) - 1)::BIGINT
         * ((SELECT count(*) FROM cb) - 1)::BIGINT AS dof,
       sum(cq)::DOUBLE / 1000000.0 AS chi2
FROM contrib
"""


def frequent_pairs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent event-type pair mining over user baskets (operators/
    behavior.py:frequent_pairs): distinct (basket, item) reduction,
    basket-keyed self-join, integer supports for exact
    confidence/lift."""
    _prep(spark)
    from energy_pandas_spark.operators.behavior import frequent_pairs

    ev = _t(spark, sf_dir, "events")
    return frequent_pairs(ev, min_support=5).orderBy("item_a", "item_b")


_FREQUENT_PAIRS_SQL = r"""
WITH base AS (
  SELECT DISTINCT user_id AS b, event_type AS i FROM events
), sup AS (
  SELECT i, count(*)::BIGINT AS s FROM base GROUP BY 1
), pairs AS (
  SELECT a.i AS item_a, b2.i AS item_b, count(*)::BIGINT AS support
  FROM base a JOIN base b2 ON a.b = b2.b AND a.i < b2.i
  GROUP BY 1, 2 HAVING count(*) >= 5
)
SELECT p.item_a, p.item_b, p.support,
       sa.s AS support_a, sb.s AS support_b
FROM pairs p
JOIN sup sa ON sa.i = p.item_a
JOIN sup sb ON sb.i = p.item_b
ORDER BY p.item_a, p.item_b
"""


def token_entropy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram Shannon entropy in integer 1/1024-nat
    units (operators/text.py:token_entropy): exact weighted integer
    sums, one floor division, empty docs at 0."""
    _prep(spark)
    from energy_pandas_spark.operators.text import token_entropy

    docs = _t(spark, sf_dir, "documents")
    return token_entropy(docs).orderBy("doc_id")


_TOKEN_ENTROPY_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     x -> x != '') AS t
  FROM documents
), cnt AS (
  SELECT doc_id, term, count(*)::BIGINT AS c
  FROM (SELECT doc_id, unnest(t) AS term FROM toks)
  GROUP BY 1, 2
), per AS (
  SELECT doc_id, sum(c)::BIGINT AS n_tokens,
         sum(c * round(1024.0 * ln(c))::BIGINT)::BIGINT AS s
  FROM cnt GROUP BY 1
)
SELECT d.doc_id,
       coalesce(per.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(round(1024.0 * ln(per.n_tokens))::BIGINT - per.s // per.n_tokens,
                0)::BIGINT AS entropy_q
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN per ON per.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def pool_embeddings_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-label centroid pooling (operators/similarity.py:
    pool_embeddings): posexplode to (label, dim) integer-quantized
    sums, one correctly-rounded division per component, array
    reassembly from the d-bounded dim set. The query ships the pooled
    array posexploded back to scalar (label, dim, component,
    n_vectors) rows — array columns crash the driver's pandas
    sort_values canonicalizer (the r5 doc_hashed_embedding class; the
    local gate now rejects them)."""
    _prep(spark)
    from energy_pandas_spark.operators.similarity import pool_embeddings

    emb = _t(spark, sf_dir, "embeddings")
    pooled = pool_embeddings(emb, "label")
    return (
        pooled.select(
            "label",
            "n_vectors",
            F.posexplode("pooled").alias("dim", "component"),
        )
        .select("label", "dim", "component", "n_vectors")
        .orderBy("label", "dim")
    )


_POOL_EMBEDDINGS_SQL = r"""
WITH ex AS (
  SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
         unnest(embedding) AS v
  FROM embeddings
), agg AS (
  SELECT label, dim,
         sum(round(1048576.0 * v::DOUBLE))::BIGINT AS sq,
         count(*)::BIGINT AS c
  FROM ex GROUP BY 1, 2
)
SELECT label,
       CAST(dim AS INTEGER) AS dim,
       sq::DOUBLE / (1048576 * c)::DOUBLE AS component,
       (max(c) OVER (PARTITION BY label))::BIGINT AS n_vectors
FROM agg ORDER BY label, dim
"""


def centroid_eval_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid confusion matrix (operators/similarity.py:
    nearest_centroid_eval): exact integer-quantized distances against
    broadcast per-label centroids, deterministic smallest-label
    tie-break."""
    _prep(spark)
    from energy_pandas_spark.operators.similarity import nearest_centroid_eval

    emb = _t(spark, sf_dir, "embeddings")
    return nearest_centroid_eval(emb, id_col="vec_id").orderBy(
        "label", "assigned"
    )


_CENTROID_EVAL_SQL = r"""
WITH ex AS (
  SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
         unnest(embedding) AS v
  FROM embeddings
), agg AS (
  SELECT label, dim,
         sum(round(1048576.0 * v::DOUBLE))::BIGINT AS sq,
         count(*)::BIGINT AS c
  FROM ex GROUP BY 1, 2
), cent AS (
  SELECT label AS clabel,
         array_agg(sq::DOUBLE / (1048576 * c)::DOUBLE ORDER BY dim) AS pooled
  FROM agg GROUP BY label
), cq AS (
  SELECT clabel,
         list_transform(pooled, x -> round(1048576.0 * x)::BIGINT) AS cqv
  FROM cent
), vq AS (
  SELECT vec_id, label,
         list_transform(embedding,
                        x -> round(1048576.0 * x::DOUBLE)::BIGINT) AS vqv
  FROM embeddings
), pairs AS (
  SELECT vec_id, label, clabel, unnest(vqv) AS a, unnest(cqv) AS b
  FROM vq CROSS JOIN cq
), d AS (
  SELECT vec_id, label, clabel, sum((a - b) * (a - b))::BIGINT AS dist
  FROM pairs GROUP BY 1, 2, 3
), best AS (
  SELECT vec_id, label, clabel,
         row_number() OVER (PARTITION BY vec_id ORDER BY dist, clabel) AS rn
  FROM d
)
SELECT label, clabel AS assigned, count(*)::BIGINT AS n
FROM best WHERE rn = 1 GROUP BY 1, 2 ORDER BY label, assigned
"""


def corpus_health_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus health card (operators/pipeline.py:
    corpus_health): Zipf slope + source Gini + mean 3-gram novelty,
    composed from the session's exact-arithmetic diagnostics; three
    1-row branches broadcast-cross-joined."""
    _prep(spark)
    from energy_pandas_spark.operators.pipeline import corpus_health

    docs = _t(spark, sf_dir, "documents")
    return corpus_health(docs)


_CORPUS_HEALTH_SQL = r"""
WITH toks AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     x -> x != '') AS t
  FROM documents
), tf AS (
  SELECT unnest(t) AS term FROM toks
), cnt AS (
  SELECT term, count(*)::BIGINT AS c FROM tf GROUP BY 1
), rankedz AS (
  SELECT c, term, row_number() OVER (ORDER BY c DESC, term) AS r FROM cnt
), qz AS (
  SELECT round(1024.0 * ln(r))::BIGINT AS xq,
         round(1024.0 * ln(c))::BIGINT AS yq, c
  FROM rankedz
), sz AS (
  SELECT count(*)::HUGEINT AS n, sum(xq)::HUGEINT AS sx,
         sum(yq)::HUGEINT AS sy, sum(xq * yq)::HUGEINT AS sxy,
         sum(xq * xq)::HUGEINT AS sxx, sum(c)::BIGINT AS total_tokens
  FROM qz
), z AS (
  SELECT n::BIGINT AS n_terms, total_tokens,
         ((n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx)::DOUBLE)
           AS zipf_slope
  FROM sz
), tot AS (
  SELECT source, sum(len(t))::BIGINT AS x FROM toks GROUP BY 1
), idxg AS (
  SELECT x, row_number() OVER (ORDER BY x, source) AS i FROM tot
), sg AS (
  SELECT count(*)::HUGEINT AS n, sum(x)::HUGEINT AS sx,
         sum(i * x)::HUGEINT AS six
  FROM idxg
), g AS (
  SELECT n::BIGINT AS n_sources,
         ((2 * six - (n + 1) * sx)::DOUBLE / (n * sx)::DOUBLE) AS source_gini
  FROM sg
), grams AS (
  SELECT doc_id, array_to_string(t[i:i + 2], ' ') AS gram
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
  WHERE len(t) >= 3
  UNION ALL
  SELECT doc_id, array_to_string(t, ' ') AS gram FROM toks WHERE len(t) < 3
), pairs AS (
  SELECT DISTINCT doc_id, gram FROM grams
), dfreq AS (
  SELECT gram, count(*)::BIGINT AS df FROM pairs GROUP BY 1
), nov AS (
  SELECT p.doc_id,
         ((1000 * sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END)) // count(*))
           AS pm
  FROM pairs p JOIN dfreq d USING (gram)
  GROUP BY p.doc_id
), nv AS (
  SELECT count(*)::BIGINT AS n_docs,
         (sum(pm) // count(*))::BIGINT AS mean_novelty_pm
  FROM nov
)
SELECT z.n_terms, z.total_tokens, z.zipf_slope,
       g.n_sources, g.source_gini,
       nv.n_docs, nv.mean_novelty_pm
FROM z CROSS JOIN g CROSS JOIN nv
"""


def vocab_growth_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law vocabulary growth at 10 checkpoints (operators/
    text.py:vocab_growth): term-first-seen aggregate + exact
    integer-rank boundary selection + one broadcast join."""
    _prep(spark)
    from energy_pandas_spark.operators.text import vocab_growth

    docs = _t(spark, sf_dir, "documents")
    return vocab_growth(docs, checkpoints=10)


_VOCAB_GROWTH_SQL = r"""
WITH dids AS (
  SELECT DISTINCT doc_id FROM documents
), ids AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS r FROM dids
), n AS (
  SELECT count(*)::BIGINT AS n FROM dids
), rk AS (
  SELECT DISTINCT greatest((n.n * d) // 10, 1) AS r
  FROM (SELECT unnest(range(1, 11)) AS d) CROSS JOIN n
), cps AS (
  SELECT row_number() OVER (ORDER BY rk.r)::INT AS checkpoint,
         rk.r::BIGINT AS n_docs, ids.doc_id AS up_to_id
  FROM rk JOIN ids ON ids.r = rk.r
), tm AS (
  SELECT term, min(doc_id) AS first
  FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(coalesce(text, '')),
                                                 '\s+'), x -> x != '')) AS term
    FROM documents
  )
  GROUP BY term
)
SELECT checkpoint, n_docs, up_to_id, count(*)::BIGINT AS vocab
FROM cps JOIN tm ON tm.first <= cps.up_to_id
GROUP BY 1, 2, 3 ORDER BY checkpoint
"""


def winnow_fp_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprints (operators/dedup.py:
    winnow_fingerprints, k=3 w=4): per-window rightmost-minimum
    selection over packed hash*2^20+(2^20-1-pos) keys — zero-shuffle
    codegen'd array expressions; oracle replays the window minimum in
    SQL."""
    _prep(spark)
    from energy_pandas_spark.operators.dedup import winnow_fingerprints

    docs = _t(spark, sf_dir, "documents")
    return winnow_fingerprints(docs).orderBy("doc_id", "pos")


_WINNOW_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     x -> x != '') AS t
  FROM documents
), g AS (
  SELECT doc_id, i - 1 AS j, array_to_string(t[i:i + 2], ' ') AS gram
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
  WHERE len(t) >= 3
  UNION ALL
  SELECT doc_id, 0 AS j, array_to_string(t, ' ') AS gram
  FROM toks WHERE len(t) < 3
), keys AS (
  SELECT doc_id, j,
         ('0x' || substr(md5(gram), 1, 10))::BIGINT * 1048576
           + (1048575 - j) AS key
  FROM g
), m AS (
  SELECT doc_id, count(*)::BIGINT AS m FROM keys GROUP BY 1
), win AS (
  SELECT keys.doc_id, keys.j, m.m,
         min(keys.key) OVER (PARTITION BY keys.doc_id ORDER BY keys.j
                             ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
  FROM keys JOIN m ON m.doc_id = keys.doc_id
), sel AS (
  SELECT DISTINCT doc_id, wmin AS key
  FROM win WHERE j <= m - 4 OR (m < 4 AND j = 0)
)
SELECT doc_id, key // 1048576 AS fp_hash, 1048575 - (key % 1048576) AS pos
FROM sel ORDER BY doc_id, pos
"""


def score_agreement_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank agreement (operators/analytics.py:spearman_corr)
    between two document scores (n_chars vs distinct-token count):
    permutation ranks from the distributed-rank helper, exact
    DECIMAL(38,0) sum of squared rank differences, one double
    division."""
    _prep(spark)
    from energy_pandas_spark.functions.textfns import tokens
    from energy_pandas_spark.operators.analytics import spearman_corr

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "n_chars",
        F.size(F.array_distinct(tokens("text"))).alias("n_vocab"),
    )
    return spearman_corr(scored, "n_chars", "n_vocab")


_SCORE_AGREEMENT_SQL = r"""
WITH t AS (
  SELECT doc_id, n_chars,
         len(list_distinct(list_filter(
             string_split_regex(lower(coalesce(text, '')), '\s+'),
             x -> x != ''))) AS n_vocab
  FROM documents
), ra AS (
  SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS ra
  FROM t
), rb AS (
  SELECT doc_id, row_number() OVER (ORDER BY n_vocab DESC, doc_id) - 1 AS rb
  FROM t
), s AS (
  SELECT count(*)::HUGEINT AS n,
         sum((ra.ra - rb.rb) * (ra.ra - rb.rb))::HUGEINT AS sd2
  FROM ra JOIN rb USING (doc_id)
)
SELECT n::BIGINT AS n,
       sd2::BIGINT AS sum_d2,
       (1.0::DOUBLE - (6 * sd2)::DOUBLE / (n * (n * n - 1))::DOUBLE) AS rho
FROM s
"""


def source_concentration_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini concentration of token mass across sources (operators/
    analytics.py:gini_concentration): exact integer aggregates over
    ascending group totals, one double division."""
    _prep(spark)
    from energy_pandas_spark.functions.textfns import tokens
    from energy_pandas_spark.operators.analytics import gini_concentration

    docs = _t(spark, sf_dir, "documents")
    w = docs.select("source", F.size(tokens("text")).alias("w"))
    return gini_concentration(w, "source", "w")


_SOURCE_CONCENTRATION_SQL = r"""
WITH t AS (
  SELECT source,
         len(list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                         x -> x != '')) AS w
  FROM documents
), tot AS (
  SELECT source, sum(w)::BIGINT AS x FROM t GROUP BY 1
), idx AS (
  SELECT x, row_number() OVER (ORDER BY x, source) AS i FROM tot
), s AS (
  SELECT count(*)::HUGEINT AS n, sum(x)::HUGEINT AS sx,
         sum(i * x)::HUGEINT AS six
  FROM idx
)
SELECT n::BIGINT AS n_groups, sx::BIGINT AS total,
       ((2 * six - (n + 1) * sx)::DOUBLE / (n * sx)::DOUBLE) AS gini
FROM s
"""


def wet_roundtrip_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common Crawl WET source exercised end-to-end in one plan
    (sources/wet.py): every document encodes into a spec-exact WARC
    ``conversion`` record, the batch's records gzip into a shard blob,
    and ``iter_warc_records`` parses the shard back — the oracle
    recomputes the parsed fields (URI, char count, UTF-8 payload
    bytes) directly from the table, so a parser/encoder drift on
    either side breaks the hash. Distributed: each Arrow batch is its
    own shard; no driver-side bytes."""
    _prep(spark)
    from energy_pandas_spark.util import spread_partitions

    docs = spread_partitions(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )

    def rt(it):
        import gzip

        import pandas as pd

        from energy_pandas_spark.sources.wet import (
            _decompress,
            encode_warc,
            iter_warc_records,
        )

        for pdf in it:
            recs = [
                (
                    f"<urn:doc:{int(d)}>",
                    f"http://corpus.example/{int(d)}",
                    "2024-01-01T00:00:00Z",
                    t if t is not None else "",
                )
                for d, t in zip(pdf["doc_id"], pdf["text"])
            ]
            shard = gzip.compress(encode_warc(recs))
            rows = [
                (
                    h["warc-target-uri"],
                    p.decode("utf-8"),
                    len(p),
                )
                for h, p in iter_warc_records(_decompress(shard))
            ]
            yield pd.DataFrame(rows, columns=["url", "text", "n_bytes"])

    parsed = docs.mapInPandas(rt, "url string, text string, n_bytes long")
    return parsed.select(
        "url",
        F.length("text").cast("long").alias("n_chars"),
        "n_bytes",
    )


_WET_ROUNDTRIP_SQL = r"""
SELECT 'http://corpus.example/' || doc_id AS url,
       length(coalesce(text, '')) AS n_chars,
       octet_length(encode(coalesce(text, ''))) AS n_bytes
FROM documents
"""


def skew_card_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew card for the events user key (operators/
    diagnostics.py:key_skew_stats): exact integer counts, per-mille
    floor-division ratios — the measurement that gates salted_join /
    AQE-skew / broadcast decisions."""
    _prep(spark)
    from energy_pandas_spark.operators.diagnostics import key_skew_stats

    ev = _t(spark, sf_dir, "events")
    return key_skew_stats(ev, "user_id")


_SKEW_CARD_SQL = r"""
WITH h AS (
  SELECT user_id, count(*)::BIGINT AS c FROM events GROUP BY 1
), s AS (
  SELECT sum(c)::BIGINT AS n_rows, count(*)::BIGINT AS n_keys,
         max(c)::BIGINT AS max_key_rows
  FROM h
)
SELECT n_rows, n_keys, max_key_rows,
       ((1000 * max_key_rows) // greatest(n_rows // n_keys, 1))::BIGINT
         AS skew_ratio_pm,
       ((1000 * max_key_rows) // n_rows)::BIGINT AS top1_share_pm
FROM s
"""


def hot_users_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 10 hottest event users with per-mille row share
    (operators/diagnostics.py:top_keys): distinct-key aggregate +
    bounded top-k (TakeOrderedAndProject), count-desc/key-asc
    deterministic order."""
    _prep(spark)
    from energy_pandas_spark.operators.diagnostics import top_keys

    ev = _t(spark, sf_dir, "events")
    return top_keys(ev, "user_id", k=10)


_HOT_USERS_SQL = r"""
WITH h AS (
  SELECT user_id, count(*)::BIGINT AS key_rows FROM events GROUP BY 1
), t AS (
  SELECT sum(key_rows)::BIGINT AS tt FROM h
)
SELECT user_id, key_rows,
       ((1000 * key_rows) // tt)::BIGINT AS share_pm
FROM h CROSS JOIN t
ORDER BY key_rows DESC, user_id ASC
LIMIT 10
"""


def ngram_novelty_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 3-gram originality (operators/text.py:
    ngram_novelty): distinct (doc, gram) pairs persist once and feed
    both the gram document-frequency aggregate and the join-back;
    integer per-mille output."""
    _prep(spark)
    from energy_pandas_spark.operators.text import ngram_novelty

    docs = _t(spark, sf_dir, "documents")
    return ngram_novelty(docs).orderBy("doc_id")


_NGRAM_NOVELTY_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     x -> x != '') AS t
  FROM documents
), grams AS (
  SELECT doc_id, array_to_string(t[i:i + 2], ' ') AS gram
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
  WHERE len(t) >= 3
  UNION ALL
  SELECT doc_id, array_to_string(t, ' ') AS gram FROM toks WHERE len(t) < 3
), pairs AS (
  SELECT DISTINCT doc_id, gram FROM grams
), dfreq AS (
  SELECT gram, count(*)::BIGINT AS df FROM pairs GROUP BY 1
)
SELECT p.doc_id,
       count(*)::BIGINT AS n_grams,
       sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END)::BIGINT AS novel,
       ((1000 * sum(CASE WHEN d.df = 1 THEN 1 ELSE 0 END)) // count(*))::BIGINT
         AS novelty_pm
FROM pairs p JOIN dfreq d USING (gram)
GROUP BY p.doc_id ORDER BY doc_id
"""


def zipf_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fingerprint of the corpus (operators/text.py:
    zipf_fit): integer-quantized log-log regression over the full term
    frequency table — exact DECIMAL(38,0) sums, distributed term
    ranking (no single-partition window), one correctly-rounded double
    division per coefficient."""
    _prep(spark)
    from energy_pandas_spark.operators.text import zipf_fit

    docs = _t(spark, sf_dir, "documents")
    return zipf_fit(docs)


_ZIPF_SQL = r"""
WITH toks AS (
  SELECT list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     x -> x != '') AS t
  FROM documents
), tf AS (
  SELECT unnest(t) AS term FROM toks
), cnt AS (
  SELECT term, count(*)::BIGINT AS c FROM tf GROUP BY 1
), ranked AS (
  SELECT c, term, row_number() OVER (ORDER BY c DESC, term) AS r FROM cnt
), q AS (
  SELECT round(1024.0 * ln(r))::BIGINT AS xq,
         round(1024.0 * ln(c))::BIGINT AS yq,
         c
  FROM ranked
), s AS (
  SELECT count(*)::HUGEINT AS n,
         sum(xq)::HUGEINT AS sx,
         sum(yq)::HUGEINT AS sy,
         sum(xq * yq)::HUGEINT AS sxy,
         sum(xq * xq)::HUGEINT AS sxx,
         sum(c)::BIGINT AS total_tokens
  FROM q
)
SELECT n::BIGINT AS n_terms,
       total_tokens,
       ((n * sxy - sx * sy)::DOUBLE / (n * sxx - sx * sx)::DOUBLE) AS slope,
       ((sy * sxx - sx * sxy)::DOUBLE / (n * sxx - sx * sx)::DOUBLE / 1024.0)
         AS intercept
FROM s
"""


def related_terms_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query expansion by personalized PageRank (operators/text.py:
    related_terms): teleport pinned to the seed terms on the same
    co-occurrence graph and integer iteration as textrank_docs, seeds
    excluded from the board. Bit-exact vs the oracle's unrolled
    replay."""
    _prep(spark)
    from energy_pandas_spark.operators.text import related_terms

    docs = _t(spark, sf_dir, "documents")
    return related_terms(
        docs, ["customer", "query"], top=20, n_iter=10
    ).orderBy("rank")


def _related_terms_sql(
    seeds: tuple = ("customer", "query"), top: int = 20, n_iter: int = 10
) -> str:
    """Oracle: the personalized variant of _textrank_sql — teleport
    mass only to the seed rows (scale // |S∩nodes| each), same
    unrolled integer iteration, seeds dropped before ranking."""
    scale = 1 << 40
    inlist = ", ".join(f"'{s}'" for s in seeds)
    its = []
    prev = "r0"
    for k in range(1, n_iter + 1):
        its.append(
            f"""r{k} AS (
  SELECT nd.u,
         ((CASE WHEN nd.is_seed THEN 3 * ({scale} // sstat.n) ELSE 0 END)
          + 17 * coalesce(s.s, 0)) // 20 AS r
  FROM nodes nd CROSS JOIN sstat
  LEFT JOIN (
    SELECT e.v AS u, sum(rp.r // dd.d)::BIGINT AS s
    FROM edges e
    JOIN {prev} rp ON rp.u = e.u
    JOIN deg dd ON dd.u = e.u
    GROUP BY e.v
  ) s ON s.u = nd.u
)"""
        )
        prev = f"r{k}"
    iter_ctes = ",\n".join(its)
    return rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     x -> x != '') AS t
  FROM documents
), bg AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i)
), und AS (
  SELECT least(w1, w2) AS u, greatest(w1, w2) AS v
  FROM bg WHERE w1 <> w2 GROUP BY 1, 2
), edges AS (
  SELECT u, v FROM und UNION ALL SELECT v AS u, u AS v FROM und
), deg AS (
  SELECT u, count(*)::BIGINT AS d FROM edges GROUP BY 1
), seeds AS (
  SELECT u FROM deg WHERE u IN ({inlist})
), sstat AS (
  SELECT count(*)::BIGINT AS n FROM seeds
), nodes AS (
  SELECT d.u, (s.u IS NOT NULL) AS is_seed
  FROM deg d LEFT JOIN seeds s ON s.u = d.u
), r0 AS (
  SELECT u,
         (CASE WHEN is_seed THEN ({scale} // sstat.n) ELSE 0 END)::BIGINT AS r
  FROM nodes CROSS JOIN sstat
),
{iter_ctes},
ranked AS (
  SELECT u AS term, r::BIGINT AS rank_q,
         row_number() OVER (ORDER BY r DESC, u) AS rank
  FROM {prev} WHERE u NOT IN ({inlist})
)
SELECT term, rank_q, rank::INT AS rank
FROM ranked WHERE rank <= {top} ORDER BY rank
"""


def compression_ratio_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression-ratio quality signal (operators/text.py:
    compression_ratio) — rows-only by nature (no SQL engine ships
    zlib) but fully deterministic: zlib output is specified by
    (input, level); Arrow batch kernel, zero shuffle."""
    _prep(spark)
    from energy_pandas_spark.operators.text import compression_ratio

    docs = _t(spark, sf_dir, "documents")
    return compression_ratio(docs).orderBy("doc_id")


_DE_LINE = "der hund und die katze ist nicht ein mit auf"
_FR_LINE = "le chat est dans la maison et pour que"


def mixed_language_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document language-mixing audit (operators/text.py:
    mixed_language_stats) over documents with deterministic German /
    French lines injected (the corpus is single-line, so injection
    exercises the mixing path): per-line stopword votes, two long-only
    aggregates, lexicographic-struct majority, integer-arithmetic
    mixing threshold."""
    _prep(spark)
    from energy_pandas_spark.operators.text import mixed_language_stats

    docs = _t(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 4 == 0, F.lit("\n" + _DE_LINE)
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 6 == 0, F.lit("\n" + _FR_LINE)
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return (
        mixed_language_stats(injected)
        .select(
            "doc_id", "n_lines", "n_langs", "majority_lang",
            "majority_lines", "majority_share_micro", "is_mixed",
        )
        .orderBy("doc_id")
    )


def _mixed_language_sql() -> str:
    votes, case = _langid_vote_sql()
    return rf"""
WITH inj AS (
  SELECT doc_id,
         text
         || (CASE WHEN doc_id % 4 = 0 THEN chr(10) || '{_DE_LINE}' ELSE '' END)
         || (CASE WHEN doc_id % 6 = 0 THEN chr(10) || '{_FR_LINE}' ELSE '' END)
           AS text
  FROM documents
), l AS (
  SELECT doc_id, line FROM (
    SELECT doc_id, unnest(string_split(coalesce(text, ''), chr(10))) AS line
    FROM inj
  ) WHERE trim(regexp_replace(lower(line), '\s+', ' ', 'g')) != ''
), t AS (
  SELECT doc_id,
         list_distinct(list_filter(string_split_regex(lower(line), '\s+'),
                                   x -> x != '')) AS toks,
         string_split(line, '') AS chars
  FROM l
), s AS (
  SELECT doc_id,
         {votes}
  FROM t
), v AS (
  SELECT doc_id,
  {case} AS lg
  FROM s
), c AS (
  SELECT doc_id, lg, count(*) AS n FROM v GROUP BY 1, 2
), per AS (
  SELECT doc_id, sum(n) AS n_lines, count(*) AS n_langs FROM c GROUP BY 1
), mj AS (
  SELECT doc_id, lg AS majority_lang, n AS majority_lines FROM (
    SELECT doc_id, lg, n,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY n DESC, lg DESC) AS rn
    FROM c
  ) WHERE rn = 1
)
SELECT d.doc_id,
       coalesce(per.n_lines, 0)::BIGINT AS n_lines,
       coalesce(per.n_langs, 0)::BIGINT AS n_langs,
       coalesce(mj.majority_lang, 'und') AS majority_lang,
       coalesce(mj.majority_lines, 0)::BIGINT AS majority_lines,
       (coalesce(mj.majority_lines, 0) * 1000000
        // greatest(coalesce(per.n_lines, 0), 1))::BIGINT
         AS majority_share_micro,
       (coalesce(per.n_langs, 0) >= 2
        AND coalesce(mj.majority_lines, 0) * 1000
            < 700 * coalesce(per.n_lines, 0)) AS is_mixed
FROM documents d
LEFT JOIN per ON per.doc_id = d.doc_id
LEFT JOIN mj ON mj.doc_id = d.doc_id
ORDER BY d.doc_id
"""


_CYR_LINE = "системы обработки данных работают надёжно"
_HAN_LINE = "分布式数据处理系统"


def script_mix_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Unicode-script audit (operators/text.py:
    script_mix) over documents with deterministic Cyrillic / Han
    spans injected (the corpus is Latin-only, so injection exercises
    the mixed-script and dominance-flip paths): nine codegen'd
    regexp_count classes + total letters, priority-tiebroken argmax,
    integer purity permille. Map-only projection; the DuckDB oracle
    evaluates RE2's \\p{Script} twins of the JVM \\p{IsScript}
    classes (parity-probed)."""
    _prep(spark)
    from energy_pandas_spark.operators.text import SCRIPT_CLASSES, script_mix
    from energy_pandas_spark.util import spread_partitions

    # ten Unicode-class regex scans per doc are CPU-bound: spread the
    # single-file small-SF scan across cores (no-op at real scale)
    docs = spread_partitions(_t(spark, sf_dir, "documents"))
    injected = docs.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(
                F.col("doc_id") % 5 == 0, F.lit(" " + _CYR_LINE)
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 7 == 0, F.lit(" " + _HAN_LINE)
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    cols = [f"n_{name}" for name, _ in SCRIPT_CLASSES]
    return (
        script_mix(injected)
        .select(
            "doc_id",
            *cols,
            "n_script_other",
            "n_letters",
            "dominant_script",
            "script_purity_permille",
        )
        .orderBy("doc_id")
    )


_SCRIPT_MIX_SQL = rf"""
WITH inj AS (
  SELECT doc_id,
         coalesce(text, '')
         || (CASE WHEN doc_id % 5 = 0 THEN ' {_CYR_LINE}' ELSE '' END)
         || (CASE WHEN doc_id % 7 = 0 THEN ' {_HAN_LINE}' ELSE '' END)
           AS text
  FROM documents
), s AS (
  -- RE2 has no char-class intersection, so the letters-only filter
  -- (Spark: [\p{{IsXxx}}&&\p{{L}}]) extracts script members and
  -- list_filters them by \p{{L}}
  SELECT doc_id,
         len(list_filter(regexp_extract_all(text, '\p{{Latin}}'),
             c -> regexp_matches(c, '\p{{L}}')))::BIGINT AS n_latin,
         len(list_filter(regexp_extract_all(text, '\p{{Cyrillic}}'),
             c -> regexp_matches(c, '\p{{L}}')))::BIGINT AS n_cyrillic,
         len(list_filter(regexp_extract_all(text, '\p{{Greek}}'),
             c -> regexp_matches(c, '\p{{L}}')))::BIGINT AS n_greek,
         len(list_filter(regexp_extract_all(text, '\p{{Han}}'),
             c -> regexp_matches(c, '\p{{L}}')))::BIGINT AS n_han,
         len(list_filter(regexp_extract_all(text, '[\p{{Hiragana}}\p{{Katakana}}]'),
             c -> regexp_matches(c, '\p{{L}}')))::BIGINT AS n_kana,
         len(list_filter(regexp_extract_all(text, '\p{{Hangul}}'),
             c -> regexp_matches(c, '\p{{L}}')))::BIGINT AS n_hangul,
         len(list_filter(regexp_extract_all(text, '\p{{Arabic}}'),
             c -> regexp_matches(c, '\p{{L}}')))::BIGINT AS n_arabic,
         len(list_filter(regexp_extract_all(text, '\p{{Hebrew}}'),
             c -> regexp_matches(c, '\p{{L}}')))::BIGINT AS n_hebrew,
         len(list_filter(regexp_extract_all(text, '\p{{Devanagari}}'),
             c -> regexp_matches(c, '\p{{L}}')))::BIGINT AS n_devanagari,
         len(regexp_extract_all(text, '\p{{L}}'))::BIGINT AS n_letters
  FROM inj
), t AS (
  SELECT *,
         n_letters - (n_latin + n_cyrillic + n_greek + n_han + n_kana
                      + n_hangul + n_arabic + n_hebrew + n_devanagari)
           AS n_script_other
  FROM s
), d AS (
  SELECT *,
         greatest(n_latin, n_cyrillic, n_greek, n_han, n_kana, n_hangul,
                  n_arabic, n_hebrew, n_devanagari, n_script_other) AS gmax
  FROM t
)
SELECT doc_id, n_latin, n_cyrillic, n_greek, n_han, n_kana, n_hangul,
       n_arabic, n_hebrew, n_devanagari, n_script_other, n_letters,
       CASE WHEN n_letters = 0 THEN 'none'
            WHEN n_latin = gmax THEN 'latin'
            WHEN n_cyrillic = gmax THEN 'cyrillic'
            WHEN n_greek = gmax THEN 'greek'
            WHEN n_han = gmax THEN 'han'
            WHEN n_kana = gmax THEN 'kana'
            WHEN n_hangul = gmax THEN 'hangul'
            WHEN n_arabic = gmax THEN 'arabic'
            WHEN n_hebrew = gmax THEN 'hebrew'
            WHEN n_devanagari = gmax THEN 'devanagari'
            ELSE 'other' END AS dominant_script,
       (CASE WHEN n_letters = 0 THEN 0
             ELSE (1000 * gmax) // n_letters END)::BIGINT
         AS script_purity_permille
FROM d ORDER BY doc_id
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint = md5 of normalized text."""
    _prep(spark)
    from energy_pandas_spark.operators.text import fingerprint

    docs = _t(spark, sf_dir, "documents")
    return fingerprint(docs).select("doc_id", "fingerprint").orderBy("doc_id")


_DOC_FINGERPRINT_SQL = """
SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
FROM documents ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# dedup over documents
# ---------------------------------------------------------------------------


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    from energy_pandas_spark.operators.dedup import dedup_exact as _dd

    docs = _t(spark, sf_dir, "documents")
    return _dd(docs).orderBy("digest")


_DEDUP_EXACT_SQL = """
SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS digest,
       min(doc_id) AS doc_id, count(*) AS n_copies
FROM documents GROUP BY 1 ORDER BY 1
"""


def minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs w/ Jaccard verify. Oracle =
    brute-force O(n^2) Jaccard in DuckDB: sound because every true pair
    in this corpus has j >= 0.9 (nothing between 0.2 and 0.9), where a
    16-band/4-row signature's miss probability is ~(1-0.9^4)^16 = 4e-8
    — the deterministic fixed-seed LSH recovers the exact pair set."""
    _prep(spark)
    from energy_pandas_spark.operators.dedup import minhash_lsh_pairs

    docs = _t(spark, sf_dir, "documents")
    return (
        minhash_lsh_pairs(docs, threshold=0.5, num_hashes=64, bands=16)
        # jaccard_micro (integer div) instead of the rounded float:
        # round-at-tie class (SURVEY r5 addendum)
        .select("id_a", "id_b", "jaccard_micro")
        .orderBy("id_a", "id_b")
    )


def encode_docs_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-indexed encoding: top-100 doc-freq vocabulary (ids by
    integer-exact rank), docs encoded to ordered token-id arrays via a
    broadcast vocab join + per-doc positional re-assembly (struct
    array_sort — per-doc, never global).  The driver row ships a SCALAR
    md5 of the space-joined id sequence instead of the raw array (the
    driver's pandas canonicalizer cannot sort list cells — r3 red);
    the element-wise array compare lives in the local pytest gate."""
    _prep(spark)
    from energy_pandas_spark.operators.text import encode_docs, vocab_index

    docs = _t(spark, sf_dir, "documents")
    vocab = vocab_index(docs, size=100)
    out = encode_docs(docs, vocab)
    ids_str = F.concat_ws(
        " ", F.transform("token_ids", lambda x: x.cast("string"))
    )
    return out.select(
        "doc_id",
        F.md5(ids_str).alias("ids_md5"),
        F.size("token_ids").alias("n_ids"),
    ).orderBy("doc_id")


_ENCODE_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x != '') AS tl
  FROM documents
),
occ AS (
  SELECT doc_id, unnest(tl) AS term FROM toks
),
df_t AS (SELECT term, count(DISTINCT doc_id) AS doc_freq FROM occ GROUP BY 1),
vocab AS (
  SELECT term, row_number() OVER (ORDER BY doc_freq DESC, term)::INT
           AS token_id
  FROM (SELECT * FROM df_t ORDER BY doc_freq DESC, term LIMIT 100)
),
pos AS (
  SELECT doc_id, tl[ord] AS term, ord
  FROM toks, LATERAL (SELECT unnest(range(1, len(tl) + 1)) AS ord)
),
enc AS (
  SELECT doc_id,
         list(coalesce(v.token_id, 0)::INT ORDER BY ord) AS token_ids
  FROM pos LEFT JOIN vocab v USING (term) GROUP BY doc_id
)
SELECT d.doc_id,
       md5(array_to_string(coalesce(enc.token_ids, []::INT[]), ' ')) AS ids_md5,
       len(coalesce(enc.token_ids, []::INT[])) AS n_ids
FROM documents d LEFT JOIN enc USING (doc_id)
ORDER BY d.doc_id
"""


def crosscorpus_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup join BETWEEN two corpora (new slice vs historical
    store, split on doc_id here): both sides band with the same
    permutations, per-bucket id lists equi-join so ONLY cross pairs
    expand, true-Jaccard verify on candidates. Oracle = brute-force
    cross Jaccard: sound AT THE 0.5 THRESHOLD because 32 bands x 2
    rows miss a j=0.5 pair with probability (1-0.5^2)^32 ~ 1e-4 (and
    vanishingly for higher j) — 16x4 banding would miss j~0.5 pairs
    36% of the time and only looked sound because this corpus has no
    mid-similarity cross pairs."""
    _prep(spark)
    from energy_pandas_spark.operators.dedup import crosscorpus_neardup_pairs

    docs = _t(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") >= 250)
    store = docs.filter(F.col("doc_id") < 250)
    return (
        crosscorpus_neardup_pairs(
            new, store, threshold=0.5, num_hashes=64, bands=32
        )
        .select("id_new", "id_store", "jaccard_micro")
        .orderBy("id_new", "id_store")
    )


_CROSSCORPUS_SQL = r"""
WITH sh AS (
  SELECT doc_id, list_distinct([
    array_to_string(toks[i:i+2], ' ') for i in range(1, greatest(len(toks)-2, 1) + 1)
  ]) AS grams
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS toks
    FROM documents
  )
)
SELECT id_new, id_store,
       (CASE WHEN u = 0 THEN 0 ELSE i * 1000000 // u END)::BIGINT
         AS jaccard_micro
FROM (
  SELECT a.doc_id AS id_new, b.doc_id AS id_store,
         len(list_intersect(a.grams, b.grams))::BIGINT AS i,
         len(list_distinct(list_concat(a.grams, b.grams)))::BIGINT AS u
  FROM sh a JOIN sh b ON a.doc_id >= 250 AND b.doc_id < 250
)
WHERE CASE WHEN u = 0 THEN 0 >= 500000
           ELSE i * 1000000 >= 500000 * u END
ORDER BY id_new, id_store
"""


def _brute_jaccard_sql(threshold: float) -> str:
    # word-3-gram shingles exactly as functions.textfns.word_shingles:
    # docs shorter than 3 tokens contribute their full join (the i=1
    # slice of a short list IS the whole list)
    t_micro = int(round(threshold * 1_000_000))
    return rf"""
WITH sh AS (
  SELECT doc_id, list_distinct([
    array_to_string(toks[i:i+2], ' ') for i in range(1, greatest(len(toks)-2, 1) + 1)
  ]) AS grams
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS toks
    FROM documents
  )
)
SELECT id_a, id_b,
       (CASE WHEN u = 0 THEN 0 ELSE i * 1000000 // u END)::BIGINT
         AS jaccard_micro
FROM (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.grams, b.grams))::BIGINT AS i,
         len(list_distinct(list_concat(a.grams, b.grams)))::BIGINT AS u
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
WHERE CASE WHEN u = 0 THEN 0 >= {t_micro}
           ELSE i * 1000000 >= {t_micro} * u END
ORDER BY id_a, id_b
"""


def minhash_dedup_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup dedup: MinHash LSH pairs -> connected
    components -> every non-survivor doc id (cluster min survives).
    Correct on transitive chains where greedy pair-dropping over-keeps.
    Oracle = brute-force Jaccard pairs + recursive-CTE components."""
    _prep(spark)
    from energy_pandas_spark.operators.dedup import minhash_dedup

    docs = _t(spark, sf_dir, "documents")
    return minhash_dedup(
        docs, threshold=0.5, num_hashes=64, bands=16
    ).orderBy("doc_id")


_MINHASH_DEDUP_SQL = r"""
WITH RECURSIVE sh AS (
  SELECT doc_id, list_distinct([
    array_to_string(toks[i:i+2], ' ') for i in range(1, greatest(len(toks)-2, 1) + 1)
  ]) AS grams
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS toks
    FROM documents
  )
), pairs AS (
  SELECT id_a, id_b FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           len(list_intersect(a.grams, b.grams))::DOUBLE /
           len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  ) WHERE jaccard >= 0.5
), sym AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), cc(id, label) AS (
  SELECT DISTINCT u, u FROM sym
  UNION
  SELECT s.v, cc.label FROM cc JOIN sym s ON cc.id = s.u
)
SELECT id AS doc_id
FROM (SELECT id, min(label) AS component FROM cc GROUP BY id)
WHERE id != component
ORDER BY doc_id
"""


def minhash_keep_best_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup canonicalization (operators/dedup.py:
    minhash_dedup_keep_best): same LSH pairs + connected components as
    minhash_dedup_drop, but each cluster keeps its highest-token-count
    member (tie -> smallest id) instead of the smallest id. Oracle =
    brute-force Jaccard + recursive-CTE components + a rank window."""
    _prep(spark)
    from energy_pandas_spark.functions.textfns import tokens
    from energy_pandas_spark.operators.dedup import minhash_dedup_keep_best

    docs = _t(spark, sf_dir, "documents").withColumn(
        "__q", F.size(tokens(F.coalesce(F.col("text"), F.lit("")))).cast("long")
    )
    return minhash_dedup_keep_best(
        docs, "__q", threshold=0.5, num_hashes=64, bands=16
    ).orderBy("doc_id")


_MINHASH_KEEP_BEST_SQL = r"""
WITH RECURSIVE sh AS (
  SELECT doc_id, list_distinct([
    array_to_string(toks[i:i+2], ' ') for i in range(1, greatest(len(toks)-2, 1) + 1)
  ]) AS grams
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS toks
    FROM documents
  )
), pairs AS (
  SELECT id_a, id_b FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           len(list_intersect(a.grams, b.grams))::DOUBLE /
           len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  ) WHERE jaccard >= 0.5
), sym AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), cc(id, label) AS (
  SELECT DISTINCT u, u FROM sym
  UNION
  SELECT s.v, cc.label FROM cc JOIN sym s ON cc.id = s.u
), comp AS (
  SELECT id, min(label) AS component FROM cc GROUP BY id
), q AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                         x -> x != ''))::BIGINT AS q
  FROM documents
), ranked AS (
  SELECT c.id,
         row_number() OVER (PARTITION BY c.component
                            ORDER BY q.q DESC, c.id ASC) AS rn
  FROM comp c JOIN q ON q.doc_id = c.id
)
SELECT id AS doc_id FROM ranked WHERE rn > 1 ORDER BY doc_id
"""


def minhash_cluster_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster-size histogram (operators/dedup.py:
    minhash_cluster_stats) at jaccard >= 0.5 with 32x2 banding (miss
    probability ~1e-4 at the 0.5 boundary — sound at this threshold,
    unlike 16x4). Oracle = brute-force Jaccard + recursive-CTE
    components + two grouped counts."""
    _prep(spark)
    from energy_pandas_spark.operators.dedup import minhash_cluster_stats

    docs = _t(spark, sf_dir, "documents")
    return minhash_cluster_stats(
        docs, threshold=0.5, num_hashes=64, bands=32
    )


_MINHASH_CLUSTER_STATS_SQL = r"""
WITH RECURSIVE sh AS (
  SELECT doc_id, list_distinct([
    array_to_string(toks[i:i+2], ' ') for i in range(1, greatest(len(toks)-2, 1) + 1)
  ]) AS grams
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS toks
    FROM documents
  )
), pairs AS (
  SELECT id_a, id_b FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           len(list_intersect(a.grams, b.grams))::DOUBLE /
           len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  ) WHERE jaccard >= 0.5
), sym AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), cc(id, label) AS (
  SELECT DISTINCT u, u FROM sym
  UNION
  SELECT s.v, cc.label FROM cc JOIN sym s ON cc.id = s.u
), comp AS (
  SELECT id, min(label) AS component FROM cc GROUP BY id
), szs AS (
  SELECT component, count(*) AS cluster_size FROM comp GROUP BY 1
), hist AS (
  SELECT cluster_size, count(*) AS n_clusters FROM szs GROUP BY 1
  UNION ALL
  SELECT 1, (SELECT count(*) FROM documents) - (SELECT count(*) FROM comp)
  WHERE (SELECT count(*) FROM documents) > (SELECT count(*) FROM comp)
)
SELECT cluster_size::BIGINT AS cluster_size,
       n_clusters::BIGINT AS n_clusters,
       (cluster_size * n_clusters)::BIGINT AS n_docs
FROM hist
ORDER BY cluster_size
"""


def containment_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subset-duplicate detection (operators/dedup.py:containment_pairs):
    |A∩B| / min(|A|,|B|) >= 0.6 over distinct 3-shingles, candidates
    via EXACT PPJoin-style rare-shingle prefix filtering (a
    deterministic witness guarantee, not an LSH recall probability) —
    so the brute-force oracle match is unconditional, not a
    data-dependent accident."""
    _prep(spark)
    from energy_pandas_spark.operators.dedup import containment_pairs

    docs = _t(spark, sf_dir, "documents")
    return (
        containment_pairs(docs, threshold=0.6, shingle_size=3)
        .select(
            "id_a", "id_b", "size_a", "size_b", "n_inter",
            "containment_micro",
        )
        .orderBy("id_a", "id_b")
    )


_CONTAINMENT_SQL = r"""
WITH sh AS (
  SELECT doc_id, list_distinct([
    array_to_string(toks[i:i+2], ' ') for i in range(1, greatest(len(toks)-2, 1) + 1)
  ]) AS grams
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                       x -> x != '') AS toks
    FROM documents
  ) WHERE len(toks) > 0
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(a.grams)::BIGINT AS size_a, len(b.grams)::BIGINT AS size_b,
         len(list_intersect(a.grams, b.grams))::BIGINT AS n_inter
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, size_a, size_b, n_inter,
       (n_inter * 1000000 // least(size_a, size_b))::BIGINT
         AS containment_micro
FROM pairs
WHERE n_inter * 1000000 >= 600000 * least(size_a, size_b)
ORDER BY id_a, id_b
"""


# retrieval query set shared by the Spark queries and the oracles —
# covers repeated query terms (qtf=2), stopword-heavy and rare-ish
# term mixes over the synthetic vocabulary
_SEARCH_QUERIES = {
    0: "spark hash join",
    1: "window sort stream",
    2: "table table value",
    3: "merge batch scan",
    4: "the fast line",
    5: "agg key row filter",
}

_SEARCH_QUERY_VALUES = """(0,'spark',1),(0,'hash',1),(0,'join',1),
         (1,'window',1),(1,'sort',1),(1,'stream',1),
         (2,'table',2),(2,'value',1),
         (3,'merge',1),(3,'batch',1),(3,'scan',1),
         (4,'the',1),(4,'fast',1),(4,'line',1),
         (5,'agg',1),(5,'key',1),(5,'row',1),(5,'filter',1)"""


def search_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index top-10 retrieval with exact integer-quantized
    TF-IDF (operators/retrieval.py:search_topk): postings = one
    explode + map-combined aggregate, broadcast query-term prune, and
    the two-stage top-k. Scores are order-free BIGINT sums
    (idf_q = (N*1024) div df), so the oracle match is bit-exact —
    no float boundary anywhere."""
    _prep(spark)
    from energy_pandas_spark.operators.retrieval import query_terms, search_topk

    docs = _t(spark, sf_dir, "documents")
    q = query_terms(spark, _SEARCH_QUERIES)
    return search_topk(docs, q, k=10).orderBy("query_id", "rank")


_SEARCH_TOPK_SQL = rf"""
WITH rtok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                            x -> x != '')) AS term
  FROM documents
), post AS (
  SELECT doc_id, term, count(*) AS tf FROM rtok GROUP BY 1, 2
), q(query_id, term, qtf) AS (
  VALUES {_SEARCH_QUERY_VALUES}
), n AS (SELECT count(*) AS n_docs FROM documents),
dfreq AS (
  SELECT term, count(*) AS df FROM post
  WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1
), scored AS (
  SELECT q.query_id, p.doc_id,
         sum(p.tf * q.qtf * ((n.n_docs * 1024) // d.df))::BIGINT AS score_q
  FROM post p
  JOIN q ON q.term = p.term
  JOIN dfreq d ON d.term = p.term
  CROSS JOIN n
  GROUP BY 1, 2
), ranked AS (
  SELECT query_id, doc_id, score_q,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score_q DESC, doc_id
         ) AS rank
  FROM scored
)
SELECT query_id::BIGINT AS query_id, doc_id, score_q, rank::INT AS rank
FROM ranked WHERE rank <= 10
ORDER BY query_id, rank
"""


def search_all_terms_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean-AND retrieval (search_topk(require_all=True)): only
    documents containing EVERY query term rank; the matched-term count
    rides the scoring aggregate, so AND costs no extra shuffle."""
    _prep(spark)
    from energy_pandas_spark.operators.retrieval import query_terms, search_topk

    docs = _t(spark, sf_dir, "documents")
    q = query_terms(spark, _SEARCH_QUERIES)
    return search_topk(docs, q, k=10, require_all=True).orderBy(
        "query_id", "rank"
    )


_SEARCH_ALL_SQL = rf"""
WITH rtok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                            x -> x != '')) AS term
  FROM documents
), post AS (
  SELECT doc_id, term, count(*) AS tf FROM rtok GROUP BY 1, 2
), q(query_id, term, qtf) AS (
  VALUES {_SEARCH_QUERY_VALUES}
), need AS (
  SELECT query_id, count(*) AS need FROM q GROUP BY 1
), n AS (SELECT count(*) AS n_docs FROM documents),
dfreq AS (
  SELECT term, count(*) AS df FROM post
  WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1
), scored AS (
  SELECT q.query_id, p.doc_id,
         sum(p.tf * q.qtf * ((n.n_docs * 1024) // d.df))::BIGINT AS score_q,
         count(*) AS nt
  FROM post p
  JOIN q ON q.term = p.term
  JOIN dfreq d ON d.term = p.term
  CROSS JOIN n
  GROUP BY 1, 2
), ranked AS (
  SELECT s.query_id, s.doc_id, s.score_q,
         row_number() OVER (
           PARTITION BY s.query_id ORDER BY s.score_q DESC, s.doc_id
         ) AS rank
  FROM scored s JOIN need ON need.query_id = s.query_id
  WHERE s.nt = need.need
)
SELECT query_id::BIGINT AS query_id, doc_id, score_q, rank::INT AS rank
FROM ranked WHERE rank <= 10
ORDER BY query_id, rank
"""


def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 retrieval (operators/retrieval.py:bm25_topk),
    k1=1.2 b=0.75. Per-term contributions quantize to BIGINT 1/1024
    units before summing, so scores are order-free integer sums; the
    only cross-engine hazard is a 1-ulp ln() divergence landing on a
    rounding boundary (the DSIR oracle's documented caveat — both
    engines evaluate the identical IEEE expression otherwise)."""
    _prep(spark)
    from energy_pandas_spark.operators.retrieval import bm25_topk, query_terms

    docs = _t(spark, sf_dir, "documents")
    q = query_terms(spark, _SEARCH_QUERIES)
    return bm25_topk(docs, q, k=10).orderBy("query_id", "rank")


_BM25_TOPK_SQL = rf"""
WITH rtok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                            x -> x != '')) AS term
  FROM documents
), post AS (
  SELECT doc_id, term, count(*) AS tf, max(dl) AS dl FROM (
    SELECT doc_id, term, count(*) OVER (PARTITION BY doc_id) AS dl
    FROM rtok
  ) GROUP BY 1, 2
), q(query_id, term, qtf) AS (
  VALUES {_SEARCH_QUERY_VALUES}
), stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT count(*) FROM rtok) AS total_tokens
), dfreq AS (
  SELECT term, count(*) AS df FROM post
  WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1
), idf AS (
  SELECT d.term,
         ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) AS idf,
         s.total_tokens / s.n_docs AS avgdl
  FROM dfreq d CROSS JOIN stats s
), scored AS (
  SELECT q.query_id, p.doc_id,
         sum(round(1024.0 * q.qtf * i.idf *
                   ((p.tf * 2.2) /
                    (p.tf + 1.2 * (0.25 + 0.75 * p.dl / i.avgdl))))::BIGINT
         )::BIGINT AS score_q
  FROM post p
  JOIN q ON q.term = p.term
  JOIN idf i ON i.term = p.term
  GROUP BY 1, 2
), ranked AS (
  SELECT query_id, doc_id, score_q,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score_q DESC, doc_id
         ) AS rank
  FROM scored
)
SELECT query_id::BIGINT AS query_id, doc_id, score_q, rank::INT AS rank
FROM ranked WHERE rank <= 10
ORDER BY query_id, rank
"""


def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming <= 3, the standard 64-bit
    near-dup threshold -> 4 bands with guaranteed candidate recall).
    Uses the engine-portable md5 token hasher so the DuckDB oracle
    replays the signatures AND the pair set exactly (banding recall is
    guaranteed by pigeonhole, so LSH pairs == brute-force pairs unless
    a bucket cap fires — and the oracle would expose that) — promoted
    from rows-only in r5 (VERDICT r4 #6)."""
    _prep(spark)
    from energy_pandas_spark.operators.dedup import simhash_neardup_pairs

    docs = _t(spark, sf_dir, "documents")
    return simhash_neardup_pairs(docs, max_hamming=3, hasher="md5").orderBy(
        "id_a", "id_b"
    )


def ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-3-gram Jaccard over LSH candidates; brute-force oracle
    (sound for the same recall argument as minhash_pairs)."""
    _prep(spark)
    from energy_pandas_spark.operators.dedup import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    return (
        ngram_jaccard_pairs(docs, n=3, threshold=0.35)
        .select("id_a", "id_b", "jaccard_micro")
        .orderBy("id_a", "id_b")
    )


def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH + exact-cosine verification — rows-only.

    collapse_exact + auto_bits (r7): exact-identical vectors collapse
    to min-id representatives (the standard exact-then-near dedup
    pipeline), and the band-key width grows with measured corpus
    cardinality — fixed 8-bit keys degenerate every bucket past
    ~256 * max_bucket uniques, silently returning zero rows at 100×
    scale (the r7 ledger caught the class)."""
    _prep(spark)
    from energy_pandas_spark.operators.dedup import embedding_neardup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(
        emb, threshold=0.3, collapse_exact=True, auto_bits=True
    ).orderBy("id_a", "id_b")


def semdedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs: deterministic seed
    centroids (lowest-16 vec_ids), map-side cosine argmax assignment,
    ONE cluster shuffle for bucket-grouped pair expansion, exact
    sequential-fold cosine verify (same arithmetic as cosine_topk, so
    the DuckDB oracle reproduces it bit-for-bit)."""
    _prep(spark)
    from energy_pandas_spark.operators.dedup import semantic_dedup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup_pairs(emb, threshold=0.3, n_centroids=16).orderBy(
        "id_a", "id_b"
    )


def semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows surviving semantic dedup (keep-lowest-id within cluster),
    via left_anti on the pair set's id_b — only ids cross the wire."""
    _prep(spark)
    from energy_pandas_spark.operators.dedup import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    return (
        semantic_dedup(emb, threshold=0.3, n_centroids=16)
        .select("vec_id", "label")
        .orderBy("vec_id")
    )


_SEMDEDUP_ASSIGN_CTE = """
WITH cent AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cvec
  FROM embeddings WHERE vec_id < 16
),
assign AS (
  SELECT vec_id, cid::INT AS cluster FROM (
    SELECT e.vec_id, c.cid,
      row_number() OVER (
        PARTITION BY e.vec_id
        ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                        c.cvec) DESC, c.cid
      ) AS rn
    FROM embeddings e CROSS JOIN cent c
  ) WHERE rn = 1
),
sem_pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cluster,
         round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                      CAST(eb.embedding AS DOUBLE[])), 6)
           AS cosine
  FROM assign a
  JOIN assign b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  JOIN embeddings ea ON ea.vec_id = a.vec_id
  JOIN embeddings eb ON eb.vec_id = b.vec_id
  WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                               CAST(eb.embedding AS DOUBLE[])) >= 0.3
)
"""

_SEMDEDUP_PAIRS_SQL = (
    _SEMDEDUP_ASSIGN_CTE
    + "SELECT id_a, id_b, cluster, cosine FROM sem_pairs ORDER BY id_a, id_b"
)

_SEMDEDUP_KEEP_SQL = (
    _SEMDEDUP_ASSIGN_CTE
    + """
SELECT e.vec_id, e.label FROM embeddings e
WHERE e.vec_id NOT IN (SELECT DISTINCT id_b FROM sem_pairs)
ORDER BY e.vec_id
"""
)


def doc_classifier_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END quality filter: train a logistic-regression weight
    table with the distributed DataFrame-native trainer, then score
    the whole corpus with the codegen inference path
    (operators/text.py:train_text_classifier / score_with_weights) —
    rows-only (iterative float training has no SQL twin). Labels are a
    deterministic text rule (doc mentions "merge") standing in for
    human quality labels — the synthetic corpus's metadata columns are
    independent of its text, so a metadata label would have nothing to
    learn; a content rule demonstrates real distillation into the
    hashed linear model."""
    _prep(spark)
    from energy_pandas_spark.functions.textfns import tokens as _tokens
    from energy_pandas_spark.operators.text import (
        score_with_weights,
        train_text_classifier,
    )

    docs = _t(spark, sf_dir, "documents")
    labeled = docs.withColumn(
        "label", F.array_contains(_tokens("text"), "merge").cast("int")
    )
    weights, bias = train_text_classifier(
        labeled, n_features=512, iters=300, lr=8.0, trainer="sample"
    )
    return (
        score_with_weights(docs, weights, bias, n_features=512)
        .select("doc_id", "score", "label_pred")
        .orderBy("doc_id")
    )


def doc_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed linear classifier: one codegen'd
    projection (tokenize -> md5-bucket weights -> one map-combined
    aggregate). Ships the EXACT integer micro-score
    ``(S * 1e6) div (1024 * n)`` rather than ``round(score, 6)``: the
    sf1 probe caught a document whose dyadic score was exactly
    -0.0628125 — a decimal half where Spark's HALF_UP round and
    DuckDB's ties-to-even disagree. Integer `div` truncates toward
    zero on BOTH engines, so the micro-score has no rounding anywhere
    on its path."""
    _prep(spark)
    from energy_pandas_spark.operators.text import classifier_score

    docs = _t(spark, sf_dir, "documents")
    return (
        classifier_score(docs)
        .select("doc_id", "score_micro", "label_pred")
        .orderBy("doc_id")
    )


_CLASSIFIER_SQL = r"""
SELECT doc_id,
       (CASE WHEN len(toks) = 0 THEN 0
             ELSE (sq * 1000000) // (1024 * len(toks)) END)::BIGINT
         AS score_micro,
       (CASE WHEN len(toks) = 0 THEN 0.0
             ELSE sq / 1024.0 / len(toks) END > 0.0)::INT AS label_pred
FROM (
  SELECT doc_id, toks,
         list_sum(list_transform(toks, t ->
           ('0x' || substr(md5('clf-v1' || t), 1, 15))::BIGINT % 2049
              - 1024))::BIGINT AS sq
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'),
                       x -> x != '') AS toks
    FROM documents
  )
)
ORDER BY doc_id
"""


def doc_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM likelihood scoring: counts trained on the 'src0'
    slice, all documents scored with add-one smoothing. Count tables
    join the candidate bigram stream keyed on the bigram — NOT
    broadcast by design (a corpus-scale LM table is huge; AQE
    broadcasts when small)."""
    _prep(spark)
    from energy_pandas_spark.operators.text import (
        bigram_lm_score,
        bigram_lm_train,
    )

    docs = _t(spark, sf_dir, "documents")
    lm = bigram_lm_train(docs.filter(F.col("source") == "src0"))
    return bigram_lm_score(docs, lm).orderBy("doc_id")


def key_skew_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnosis on the events type key: heaviest
    groups with row share and uniform-ratio skew factor. One
    map-combined aggregate + 1-row broadcast + TakeOrdered."""
    _prep(spark)
    from energy_pandas_spark.operators.analytics import skew_stats

    ev = _t(spark, sf_dir, "events")
    # micro integer ratios instead of rounded floats (round-at-tie
    # class, SURVEY r5 addendum)
    return skew_stats(ev, "event_type", top=5).select(
        "event_type", "n_rows", "row_share_micro", "skew_factor_micro"
    )


_SKEW_SQL = """
WITH counts AS (
  SELECT event_type, count(*) AS n_rows FROM events GROUP BY 1
),
tot AS (SELECT sum(n_rows) AS total, count(*) AS n_keys FROM counts)
SELECT event_type, n_rows,
       (n_rows * 1000000 // total)::BIGINT AS row_share_micro,
       (n_rows * n_keys * 1000000 // total)::BIGINT AS skew_factor_micro
FROM counts, tot
ORDER BY n_rows DESC, event_type
LIMIT 5
"""


def funnel_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view -> click -> purchase funnel: per-stage conditional
    min-timestamp aggregates joined on the user key (co-partitioned
    exchanges), all prefixes counted in ONE lazy plan."""
    _prep(spark)
    from energy_pandas_spark.operators.behavior import funnel

    ev = _t(spark, sf_dir, "events")
    return funnel(ev, ["view", "click", "purchase"])


_FUNNEL_SQL = """
WITH s0 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY 1
),
s1 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s0 ON e.user_id = s0.user_id
  WHERE e.event_type = 'click' AND e.ts > s0.t GROUP BY 1
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s1.t GROUP BY 1
)
SELECT * FROM (
  SELECT 0 AS step_index, 'view' AS step, count(*) AS n_users FROM s0
  UNION ALL SELECT 1, 'click', count(*) FROM s1
  UNION ALL SELECT 2, 'purchase', count(*) FROM s2
) ORDER BY step_index
"""


def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: first-activity cohort per
    user + distinct user-weeks, joined on the user key; one
    count-distinct per (cohort, offset)."""
    _prep(spark)
    from energy_pandas_spark.operators.behavior import cohort_retention

    ev = _t(spark, sf_dir, "events")
    return cohort_retention(ev, period="week").orderBy(
        "cohort", "period_offset"
    )


_COHORT_SQL = """
WITH firsts AS (
  SELECT user_id, min(date_trunc('week', ts)) AS cohort
  FROM events GROUP BY 1
),
active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS p FROM events
)
SELECT cohort::DATE AS cohort,
       (date_diff('day', cohort::DATE, p::DATE) / 7)::INT AS period_offset,
       count(DISTINCT user_id) AS n_active
FROM active JOIN firsts USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


def sketch_rollup_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical distinct-count rollup WITHOUT rescans: per
    (type, day) portable-HLL register tables reduce the events table
    once; the per-type level merges registers only (one integer max —
    bit-equal to building over the union, so the DuckDB oracle replays
    the merged sketch from raw rows exactly, collisions included).
    Promoted from rows-only in r5 (VERDICT r4 #6) by switching from
    the DataSketches HLL to the engine-portable md5-register sketch
    with the quantized estimate (the hll_distinct_docs idiom)."""
    _prep(spark)
    from energy_pandas_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    ev = _t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    daily = hll_registers(ev, "user_id", by=["event_type", "day"], lgm=8)
    merged = hll_merge(daily, by="event_type")
    return hll_estimate(merged, by="event_type", lgm=8, quantize=1024).orderBy(
        "event_type"
    )


def value_rank_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-rank pack over a keyed partition: percent_rank and
    cume_dist of each event's value within its type (ties broken by
    event_id so ranks are total and engine-stable)."""
    _prep(spark)
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    # floor((x * 1e6)) of the window-function double: both engines
    # compute the identical (r-1)/(n-1) and k/n doubles, and floor of
    # one double is unambiguous — round(,6) is tie-ambiguous when the
    # partition size makes the rank ratio an exact decimal half
    return ev.select(
        "event_id",
        "event_type",
        F.floor(F.percent_rank().over(w) * F.lit(1000000.0)).alias(
            "pct_rank_micro"
        ),
        F.floor(F.cume_dist().over(w) * F.lit(1000000.0)).alias(
            "cume_micro"
        ),
    ).orderBy("event_id")


def rolling_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 6-hour OLS trend of value-vs-time per event type at
    15-minute grain. Sufficient statistics pre-aggregate into buckets
    (exactly additive), so every sliding frame spans ~24 bucket rows
    instead of tens of thousands of events — Spark rebuilds range-frame
    buffers per row, making the per-row form O(window cardinality)
    per row.

    EXACT sufficient statistics (the sf0.1 sweep caught the float
    form flipping a 6th-decimal digit vs DuckDB — window-sum order
    differs between engines): x is integer MILLISECOND ticks, y is
    integer CENT ticks, so every windowed sum is an exact integer and
    both engines compute bit-identical doubles for the closed-form
    solve; the slope rescales to value-per-day after (864000 =
    86_400_000 ms/day / 100 cents/value)."""
    _prep(spark)
    from energy_pandas_spark.operators.analytics import rolling_fit

    ev = _t(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        "ts",
        F.expr(
            "(unix_micros(ts) - unix_micros(TIMESTAMP '2024-01-01')) DIV 1000"
        )
        .cast("decimal(14,0)")
        .alias("x"),
        # floor(value*100): value*100 is one correctly-rounded IEEE op
        # (identical on both engines) and floor of identical doubles is
        # identical on ANY input — round() has a residual .5-boundary
        # class (Spark rounds the decimal repr, DuckDB the binary
        # value) and a double->DECIMAL cast the same. value is
        # 2-decimal-grid-aligned, so value*100 sits within ~1e-9 of an
        # integer and floor may pick the cent BELOW for the ~11% whose
        # float error is downward — identically on both engines, and a
        # sub-cent quantization offset in y is irrelevant to a trend
        # slope/r2.
        F.floor(F.col("value") * F.lit(100.0)).cast("decimal(15,0)").alias("y"),
    )
    out = rolling_fit(
        pts,
        "ts",
        "x",
        "y",
        window_seconds=21600,
        by="event_type",
        bucket_seconds=900,
        exact=True,
    )
    return out.select(
        "event_type",
        "ts",
        "n_window",
        F.round(F.col("slope") * F.lit(864000.0), 6).alias("slope"),
        F.round("r2", 6).alias("r2"),
    ).orderBy("event_type", "ts")


_ROLLING_TREND_SQL = """
WITH pts AS (
  SELECT event_type,
         make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS bts,
         ((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) // 1000)::HUGEINT
           AS x,
         CAST(floor(value * 100) AS HUGEINT) AS y
  FROM events
),
b AS (
  SELECT event_type, bts, count(*) AS bn, sum(x) AS bsx, sum(y) AS bsy,
         sum(x * y) AS bsxy, sum(x * x) AS bsxx, sum(y * y) AS bsyy
  FROM pts GROUP BY 1, 2
),
wsum AS (
  SELECT event_type, bts,
         sum(bn) OVER w AS nw,
         sum(bsx) OVER w AS sx, sum(bsy) OVER w AS sy,
         sum(bsxy) OVER w AS sxy, sum(bsxx) OVER w AS sxx,
         sum(bsyy) OVER w AS syy
  FROM b
  WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(bts)
               RANGE BETWEEN 21600000000 PRECEDING AND CURRENT ROW)
),
cm AS (
  -- centered co-moments in EXACT integer arithmetic (HUGEINT): the
  -- cancellation happens before any cast, so the int->double cast
  -- error is relative 1e-16 on the small centered value (DuckDB's
  -- HUGEINT->DOUBLE is 1 ulp off correctly-rounded; a raw-sum cast
  -- would amplify that ~1e5x through float cancellation)
  SELECT event_type, bts, nw,
         (nw * sxy - sx * sy) AS num,
         (nw * sxx - sx * sx) AS den,
         (nw * syy - sy * sy) AS deny
  FROM wsum
)
SELECT event_type, bts AS ts, nw::BIGINT AS n_window,
       round(CASE WHEN nw >= 2 AND den <> 0
                  THEN num::DOUBLE / den::DOUBLE * 864000.0 END, 6)
         AS slope,
       round(CASE WHEN nw >= 2 AND den <> 0 AND deny <> 0
                  THEN (num::DOUBLE * num::DOUBLE)
                         / (den::DOUBLE * deny::DOUBLE) END, 6)
         AS r2
FROM cm
ORDER BY event_type, ts
"""


_RANK_STATS_SQL = """
SELECT event_id, event_type,
       CAST(floor(percent_rank() OVER w * 1000000) AS BIGINT)
         AS pct_rank_micro,
       CAST(floor(cume_dist() OVER w * 1000000) AS BIGINT) AS cume_micro
FROM events
WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
ORDER BY event_id
"""


def doc_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup signal: fraction of 8-token spans that also
    occur in another document. Spans hash to longs at the scan (no
    span strings shuffled); the distinct-doc count and the occurrence
    join share one hash partitioning."""
    _prep(spark)
    from energy_pandas_spark.operators.text import span_dup_stats

    docs = _t(spark, sf_dir, "documents")
    return (
        span_dup_stats(docs, k=8)
        .select("doc_id", "n_spans", "n_dup_spans", "dup_frac_micro")
        .orderBy("doc_id")
    )


_DUP_SPANS_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x != '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, array_to_string(t[i : i + 7], ' ') AS g
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 6)) AS i)
),
dup AS (SELECT g, count(DISTINCT doc_id) AS n_docs FROM grams GROUP BY 1),
per AS (
  SELECT doc_id, count(*) AS n_spans,
         sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup
  FROM grams JOIN dup USING (g) GROUP BY 1
)
SELECT d.doc_id,
       coalesce(per.n_spans, 0) AS n_spans,
       coalesce(per.n_dup, 0) AS n_dup_spans,
       (CASE WHEN coalesce(per.n_spans, 0) = 0 THEN 0
             ELSE coalesce(per.n_dup, 0) * 1000000 // per.n_spans
        END)::BIGINT AS dup_frac_micro
FROM documents d LEFT JOIN per USING (doc_id)
ORDER BY d.doc_id
"""


def value_trend_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type OLS trend (slope/intercept/r2) of event value over
    time: ONE hash aggregate of sufficient statistics, closed-form
    solve — no iterative fitting, no second scan. x is days since the
    month start so the normal equations stay far from cancellation."""
    _prep(spark)
    from energy_pandas_spark.operators.analytics import linear_fit

    ev = _t(spark, sf_dir, "events")
    t0 = F.lit("2024-01-01").cast("timestamp")
    pts = ev.select(
        "event_type",
        ((F.unix_micros("ts") - F.unix_micros(t0)) / F.lit(86400e6)).alias("x"),
        F.col("value").alias("y"),
    )
    fit = linear_fit(pts, "x", "y", by="event_type")
    return fit.select(
        "event_type",
        "n",
        F.round("slope", 6).alias("slope"),
        F.round("intercept", 6).alias("intercept"),
        F.round("r2", 6).alias("r2"),
    ).orderBy("event_type")


_TREND_SQL = """
WITH pts AS (
  SELECT event_type,
         (epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) / 86400000000.0
           AS x,
         value AS y
  FROM events
),
s AS (
  SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
  FROM pts GROUP BY 1
)
SELECT event_type, n,
       round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS slope,
       round((sy - ((sxy - sx * sy / n) / (sxx - sx * sx / n)) * sx) / n, 6)
         AS intercept,
       round(((sxy - sx * sy / n) * (sxy - sx * sy / n))
               / ((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS r2
FROM s ORDER BY event_type
"""


def robust_scale_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/IQR) scaling of event values per type — exact
    percentiles here (oracle contract); percentile_approx is the
    documented sketch path at corpus scale. Per-key stats attach via a
    broadcast join, never a Window exchange."""
    _prep(spark)
    from energy_pandas_spark.operators.analytics import robust_scale

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = robust_scale(ev, value_cols=["value"], by="event_type")
    return out.select(
        "event_id", "event_type", F.round("value", 6).alias("value")
    ).orderBy("event_id")


_ROBUST_SCALE_SQL = """
WITH q AS (
  SELECT event_type,
         quantile_cont(value, 0.25) AS q1,
         quantile_cont(value, 0.5) AS q2,
         quantile_cont(value, 0.75) AS q3
  FROM events GROUP BY 1
)
SELECT e.event_id, e.event_type,
       round(CASE WHEN q3 - q1 = 0 THEN 0.0
                  ELSE (e.value - q2) / (q3 - q1) END, 6) AS value
FROM events e JOIN q USING (event_type)
ORDER BY event_id
"""


_LM_SCORE_SQL = r"""
WITH toks AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x != '') AS t
  FROM documents
),
bg AS (
  SELECT doc_id, source, t[i] AS w1, t[i + 1] AS w2
  FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i)
),
lm AS (
  SELECT w1, w2, count(*) AS c12 FROM bg WHERE source = 'src0'
  GROUP BY 1, 2
),
c1 AS (SELECT w1, sum(c12) AS c1 FROM lm GROUP BY 1),
v AS (SELECT count(DISTINCT w1) AS v FROM lm),
scored AS (
  SELECT b.doc_id,
         (coalesce(l.c12, 0) + 1)::DOUBLE
           / (coalesce(c.c1, 0) + v.v)::DOUBLE AS p
  FROM bg b
  LEFT JOIN lm l ON b.w1 = l.w1 AND b.w2 = l.w2
  LEFT JOIN c1 c ON b.w1 = c.w1
  CROSS JOIN v
),
per AS (
  SELECT doc_id, count(*) AS n_bigrams, round(avg(p), 6) AS avg_p
  FROM scored GROUP BY 1
)
SELECT d.doc_id, coalesce(per.n_bigrams, 0) AS n_bigrams,
       coalesce(per.avg_p, 0.0) AS avg_p
FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
ORDER BY d.doc_id
"""


def perplexity_buckets_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail triage (operators/text.py:
    perplexity_buckets): bigram LM trained on the src0 slice, each
    language split at its 333/666 per-mille likelihood quantiles —
    per-(lang, bucket) document counts. Integer-quantized scores +
    integer rank thresholds keep the composition engine-exact."""
    _prep(spark)
    from energy_pandas_spark.operators.text import (
        bigram_lm_train,
        perplexity_buckets,
    )

    docs = _t(spark, sf_dir, "documents")
    lm = bigram_lm_train(docs.filter(F.col("source") == "src0"))
    return (
        perplexity_buckets(docs, lm, by="lang")
        .groupBy("lang", "bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "bucket")
    )


_PERPLEXITY_BUCKETS_SQL = r"""
WITH toks AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x != '') AS t
  FROM documents
),
bg AS (
  SELECT doc_id, source, t[i] AS w1, t[i + 1] AS w2
  FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i)
),
lm AS (
  SELECT w1, w2, count(*) AS c12 FROM bg WHERE source = 'src0'
  GROUP BY 1, 2
),
c1 AS (SELECT w1, sum(c12) AS c1 FROM lm GROUP BY 1),
v AS (SELECT count(DISTINCT w1) AS v FROM lm),
scored AS (
  SELECT b.doc_id,
         (coalesce(l.c12, 0) + 1)::DOUBLE
           / (coalesce(c.c1, 0) + v.v)::DOUBLE AS p
  FROM bg b
  LEFT JOIN lm l ON b.w1 = l.w1 AND b.w2 = l.w2
  LEFT JOIN c1 c ON b.w1 = c.w1
  CROSS JOIN v
),
per AS (
  SELECT doc_id, round(avg(p), 6) AS avg_p
  FROM scored GROUP BY 1
),
q AS (
  SELECT d.doc_id, d.lang,
         round(coalesce(per.avg_p, 0.0) * 1000000)::BIGINT AS score_q
  FROM documents d LEFT JOIN per ON d.doc_id = per.doc_id
),
counts AS (SELECT lang, score_q, count(*) AS n FROM q GROUP BY 1, 2),
tot AS (SELECT lang, sum(n) AS n_rows FROM counts GROUP BY 1),
cum AS (
  SELECT lang, score_q,
         sum(n) OVER (PARTITION BY lang ORDER BY score_q
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM counts
),
tlow AS (
  SELECT c.lang, min(c.score_q) AS t_low
  FROM cum c JOIN tot t ON t.lang = c.lang
  WHERE c.c >= (t.n_rows * 333 + 999) // 1000 GROUP BY 1
),
thigh AS (
  SELECT c.lang, min(c.score_q) AS t_high
  FROM cum c JOIN tot t ON t.lang = c.lang
  WHERE c.c >= (t.n_rows * 666 + 999) // 1000 GROUP BY 1
),
lab AS (
  SELECT q.lang,
         CASE WHEN q.score_q >= th.t_high THEN 'head'
              WHEN q.score_q >= tl.t_low THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM q
  JOIN tlow tl ON tl.lang = q.lang
  JOIN thigh th ON th.lang = q.lang
)
SELECT lang, bucket, count(*)::BIGINT AS n_docs
FROM lab GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# similarity search over embeddings
# ---------------------------------------------------------------------------


def cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for 10 query vectors (two-stage
    distributed top-k)."""
    _prep(spark)
    from energy_pandas_spark.operators.similarity import cosine_topk as _topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return _topk(emb, queries, k=5).orderBy("query_id", "rank")


def cosine_topk_blas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same exact top-5 as cosine_topk, through the Arrow/BLAS batch
    kernel (one matmul per batch, in-kernel local top-k) — the
    scale-path variant; shares cosine_topk's DuckDB oracle."""
    _prep(spark)
    from energy_pandas_spark.operators.similarity import cosine_topk_arrow

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return cosine_topk_arrow(emb, queries, k=5).orderBy("query_id", "rank")


_COSINE_TOPK_SQL = """
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                      CAST(q.embedding AS DOUBLE[])), 6) AS cosine,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                           CAST(q.embedding AS DOUBLE[])) DESC,
                    c.vec_id
         ) AS rank
  FROM embeddings c, embeddings q
  WHERE q.vec_id < 10
)
WHERE rank <= 5
ORDER BY query_id, rank
"""


def embedding_dim_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding statistics (operators/similarity.py:
    embedding_dim_stats): posexplode + ONE map-combined aggregate on
    the dimension index — whitening/drift/dead-dimension audit."""
    _prep(spark)
    from energy_pandas_spark.operators.similarity import embedding_dim_stats

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_dim_stats(emb)


_EMB_DIM_STATS_SQL = """
SELECT (i - 1)::INT AS dim,
       round(avg(v), 6) AS mean,
       round(sqrt(var_pop(v)), 6) AS std,
       count(*)::BIGINT AS n
FROM (
  SELECT embedding[i]::DOUBLE AS v, i
  FROM embeddings, LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i)
)
GROUP BY 1 ORDER BY 1
"""


def hard_negatives_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (operators/similarity.py:
    hard_negative_topk): top-5 most-similar vectors with a DIFFERENT
    label for each of 10 query vectors — the contrastive-training
    near-miss set. cosine_topk's exact plan plus the label-inequality
    predicate before scoring."""
    _prep(spark)
    from energy_pandas_spark.operators.similarity import hard_negative_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )
    return hard_negative_topk(emb, queries, k=5).orderBy("query_id", "rank")


_HARD_NEGATIVES_SQL = """
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
         round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                      CAST(q.embedding AS DOUBLE[])), 6) AS cosine,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
                                           CAST(q.embedding AS DOUBLE[])) DESC,
                    c.vec_id
         ) AS rank
  FROM embeddings c, embeddings q
  WHERE q.vec_id < 10 AND c.label != q.label
)
WHERE rank <= 5
ORDER BY query_id, rank
"""


def ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-k — rows-only (approximate by
    design)."""
    _prep(spark)
    from energy_pandas_spark.operators.similarity import ivf_topk as _ivf

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return _ivf(emb, queries, k=5, n_cells=16, nprobe=4).orderBy("query_id", "rank")


def pq_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ANN: PQ codes (8 int16 subspace codes per
    64-dim vector, 16x compression) + ADC shortlist + exact rerank
    (operators/similarity.py:pq_recall_topk) — rows-only (approximate
    by design)."""
    _prep(spark)
    from energy_pandas_spark.operators.similarity import pq_recall_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return pq_recall_topk(
        emb, queries, k=5, m=8, n_codes=32, refine=4
    ).orderBy("query_id", "rank")


def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector math parity check: dims + L2 norm per embedding."""
    _prep(spark)
    from energy_pandas_spark.functions.vectors import l2_norm

    emb = _t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(l2_norm("embedding"), 6).alias("l2"),
    ).orderBy("vec_id")


_EMBEDDING_NORMS_SQL = """
SELECT vec_id, len(embedding) AS dim,
       round(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 6) AS l2
FROM embeddings ORDER BY vec_id
"""


# ---------------------------------------------------------------------------
# multimodal + clustering (rows-only)
# ---------------------------------------------------------------------------


def _feature_mean_64(out: DataFrame) -> DataFrame:
    """(media_id, features) -> (media_id, dim, mean_feature), shared by
    the three media pipelines. The HOF aggregate beats a statically
    unrolled 64-term sum here (measured 0.12s vs 0.42s at 50k rows):
    ProjectCollapse inlines per-element ``try_element_at`` chains with
    their null/bounds checks, while the lambda makes one typed pass."""
    return out.select(
        "media_id",
        F.size("features").alias("dim"),
        F.round(
            F.aggregate("features", F.lit(0.0), lambda a, x: a + x)
            / F.size("features"),
            6,
        ).alias("mean_feature"),
    ).orderBy("media_id")


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline with a REAL codec: each document's bytes are
    rendered into a 16x16 grayscale PNG inside an Arrow batch (encode),
    then ``decode_features`` round-trips them through the registered
    stdlib PNG decoder + luma block-mean extractor — rows-only (feature
    values are codec-defined, but deterministic end-to-end)."""
    _prep(spark)
    import numpy as np
    import pandas as pd

    from energy_pandas_spark.operators.codecs import (
        encode_png,
        register_default_decoders,
    )
    from energy_pandas_spark.operators.multimodal import decode_features

    register_default_decoders()
    from energy_pandas_spark.util import spread_partitions

    # a single-file scan arrives as ONE partition; the render/decode
    # kernels are CPU-bound Python, so spread them across all cores
    docs = spread_partitions(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )

    def render(it):
        for pdf in it:
            content = []
            for text in pdf["text"]:
                raw = (text or "").encode("utf-8")[:256]
                px = np.frombuffer(raw.ljust(256, b"\0"), np.uint8)
                content.append(encode_png(px.reshape(16, 16)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "content": content,
                    "meta": [
                        {"mime": "image/png", "width": 16, "height": 16,
                         "duration_ms": None}
                    ]
                    * len(pdf),
                }
            )

    media = docs.mapInPandas(
        render,
        schema=(
            "media_id long, content binary, "
            "meta struct<mime:string,width:int,height:int,duration_ms:bigint>"
        ),
    )
    return _feature_mean_64(decode_features(media, dim=64))


def image_neardup_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pixel-level image dedup (operators/multimodal.py:
    image_neardup_pairs): documents render into PNGs (the
    media_features path), decode through the registered stdlib codec,
    aHash into 64-bit perceptual signatures (zero-shuffle expression
    fold), and banded Hamming LSH surfaces the near-identical images —
    the planted exact-dup documents reappear as hamming-0 pixel pairs.
    Rows-only (the PNG+luma+aHash chain has no SQL twin), but
    deterministic end-to-end."""
    _prep(spark)
    import numpy as np
    import pandas as pd

    from energy_pandas_spark.operators.codecs import (
        encode_png,
        register_default_decoders,
    )
    from energy_pandas_spark.operators.multimodal import image_neardup_pairs
    from energy_pandas_spark.util import spread_partitions

    register_default_decoders()
    docs = spread_partitions(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )

    def render(it):
        for pdf in it:
            content = []
            for text in pdf["text"]:
                raw = (text or "").encode("utf-8")[:256]
                px = np.frombuffer(raw.ljust(256, b"\0"), np.uint8)
                content.append(encode_png(px.reshape(16, 16)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "content": content,
                    "meta": [
                        {"mime": "image/png", "width": 16, "height": 16,
                         "duration_ms": None}
                    ]
                    * len(pdf),
                }
            )

    media = docs.mapInPandas(
        render,
        schema=(
            "media_id long, content binary, "
            "meta struct<mime:string,width:int,height:int,duration_ms:bigint>"
        ),
    )
    return image_neardup_pairs(media, max_hamming=2).orderBy(
        "id_a", "id_b"
    )


def doc_hashed_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-free hashed-BOW document embeddings (operators/text.py:
    hashed_embedding): ±1 feature hashing into 16 components,
    L2-normalized — deterministic text→vector with an exact SQL twin
    (md5 buckets + correctly-rounded sqrt). Ships micro-quantized
    integer components floor((x * 1e6) / norm): both engines floor the
    IDENTICAL correctly-rounded double, where round(,6) would be
    tie-ambiguous whenever the sum of squares is a perfect square
    (rational component = possible exact decimal half).

    Output is posexploded to scalar (doc_id, i, component) rows: the
    driver canonicalizer sorts a pandas frame over ALL columns, and an
    ARRAY column makes that sort raise (unhashable list) — the r5 red.
    """
    _prep(spark)
    from energy_pandas_spark.operators.text import hashed_embedding

    docs = _t(spark, sf_dir, "documents")
    emb = hashed_embedding(docs, dim=16, micro=True, id_col="doc_id").select(
        "doc_id", "embedding"
    )
    return emb.select(
        "doc_id", F.posexplode("embedding").alias("i", "component")
    ).orderBy("doc_id", "i")


_HASHED_EMB_SQL = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')
           AS toks
  FROM documents
), r AS (
  SELECT doc_id,
         [coalesce(list_sum(
            [CASE WHEN ('0x' || substr(md5('emb-v1' || w), 1, 15))::BIGINT
                       % 16 = i
                  THEN CASE WHEN ('0x' || substr(md5('emb-v1#s' || w), 1, 15))
                                 ::BIGINT % 2 = 0
                            THEN 1 ELSE -1 END
                  ELSE 0 END
             FOR w IN toks]), 0)::BIGINT
          FOR i IN range(0, 16)] AS raw
  FROM t
), n AS (
  SELECT doc_id, raw,
         sqrt(list_sum([x * x FOR x IN raw])::DOUBLE) AS nrm
  FROM r
), e AS (
  SELECT doc_id,
         CASE WHEN nrm > 0
              THEN [CAST(floor(x::DOUBLE * 1000000 / nrm) AS BIGINT)
                    FOR x IN raw]
              ELSE [0::BIGINT FOR x IN raw] END AS embedding
  FROM n
)
SELECT e.doc_id, CAST(t.i AS INTEGER) AS i,
       e.embedding[t.i + 1] AS component
FROM e, range(0, 16) t(i)
ORDER BY doc_id, i
"""


def text_semantic_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-free semantic near-dup END-TO-END: hashed-BOW embeddings
    (doc_hashed_embedding) feed the sign-LSH embedding dedup path —
    text → vector → banded buckets → vectorized verify, no external
    model anywhere (operators/text.py:hashed_embedding +
    operators/dedup.py:embedding_neardup_pairs). Rows-only (LSH
    banding has no SQL twin); exact-dup doc pairs must surface with
    cosine 1.0.

    collapse_exact + auto_bits (r7): the original 32-plane / 16-band
    setup had 2-bit bucket keys — FOUR buckets per band — so any
    corpus past ~4k docs degenerated every bucket beyond max_bucket
    and the query silently returned zero rows at sf10 (the r7 ledger
    caught it). Exact-identical vectors now collapse to
    representatives first, and the band-key width grows with measured
    corpus cardinality so bucket occupancy stays bounded at any
    scale."""
    _prep(spark)
    from energy_pandas_spark.operators.dedup import embedding_neardup_pairs
    from energy_pandas_spark.operators.text import hashed_embedding

    docs = _t(spark, sf_dir, "documents")
    emb = hashed_embedding(docs, dim=64, id_col="doc_id").select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    return embedding_neardup_pairs(
        emb, threshold=0.9, n_planes=64, bands=8, dim=64,
        collapse_exact=True, auto_bits=True,
    ).orderBy("id_a", "id_b")


def temperature_mixture_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened source mixture at alpha=0.5 (group mass ∝
    sqrt(n) — upweights small sources): per-source counts + kept-id
    sums after the deterministic hash filter
    (operators/sampling.py:temperature_mixture). alpha=0.5 uses sqrt,
    which is IEEE correctly-rounded on BOTH engines, so the integer
    thresholds reproduce exactly in SQL (pow would not)."""
    _prep(spark)
    from energy_pandas_spark.operators.sampling import temperature_mixture

    docs = _t(spark, sf_dir, "documents")
    kept = temperature_mixture(docs, key="doc_id", group_col="lang", alpha=0.5)
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
        )
        .orderBy("lang")
    )


_TEMPERATURE_MIX_SQL = """
WITH c AS (
  SELECT lang, count(*)::BIGINT AS n FROM documents GROUP BY 1
), sc AS (
  -- mirror the driver arithmetic exactly: scale = 1 / max(sqrt(n)/n)
  SELECT 1.0 / max(sqrt(n) / n) AS scale FROM c
), t AS (
  SELECT lang,
         -- floor, not cast: DuckDB's double->int cast rounds, Python's
         -- int() truncates
         CAST(floor(least(greatest(sqrt(n) * scale / n, 0.0), 1.0) * 10000)
              AS INT) AS thresh
  FROM c, sc
)
SELECT d.lang, count(*) AS n_docs, sum(d.doc_id)::BIGINT AS id_sum
FROM documents d JOIN t USING (lang)
WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT % 10000
      < t.thresh
GROUP BY 1 ORDER BY 1
"""


def source_overlap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-vocabulary overlap (operators/text.py:
    source_vocab_overlap): distinct-term intersections + Jaccard for
    every source pair — one vocab-sized distinct aggregate persisted
    across its three consumers, then a term-keyed self-join."""
    _prep(spark)
    from energy_pandas_spark.operators.text import source_vocab_overlap

    docs = _t(spark, sf_dir, "documents")
    return (
        source_vocab_overlap(docs)
        .select(
            "source_a", "source_b", "vocab_a", "vocab_b", "n_shared",
            "jaccard_micro",
        )
        .orderBy("source_a", "source_b")
    )


_SOURCE_OVERLAP_SQL = r"""
WITH vocab AS (
  SELECT DISTINCT source,
         unnest(list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                            x -> x != '')) AS term
  FROM documents
), sizes AS (
  SELECT source, count(*) AS n_terms FROM vocab GROUP BY 1
), shared AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
  FROM vocab a JOIN vocab b ON a.term = b.term AND a.source < b.source
  GROUP BY 1, 2
)
SELECT s.source_a, s.source_b,
       sa.n_terms::BIGINT AS vocab_a,
       sb.n_terms::BIGINT AS vocab_b,
       s.n_shared::BIGINT AS n_shared,
       (s.n_shared * 1000000
        // (sa.n_terms + sb.n_terms - s.n_shared))::BIGINT AS jaccard_micro
FROM shared s
JOIN sizes sa ON sa.source = s.source_a
JOIN sizes sb ON sb.source = s.source_b
ORDER BY source_a, source_b
"""


def vocab_by_lang_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-10 vocabulary (operators/text.py:
    vocabulary_by_group): (lang, term, doc_freq, total_count, rank) by
    (doc_freq desc, term asc) — integer sort keys, two-stage per-group
    top-k."""
    _prep(spark)
    from energy_pandas_spark.operators.text import vocabulary_by_group

    docs = _t(spark, sf_dir, "documents")
    return vocabulary_by_group(docs, by="lang", top=10).orderBy("lang", "rank")


_VOCAB_BY_LANG_SQL = r"""
WITH tf AS (
  SELECT lang, doc_id, term, count(*) AS tf FROM (
    SELECT lang, doc_id,
           unnest(list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                              x -> x != '')) AS term
    FROM documents
  ) GROUP BY 1, 2, 3
), terms AS (
  SELECT lang, term, count(*) AS doc_freq, sum(tf) AS total_count
  FROM tf GROUP BY 1, 2
), ranked AS (
  SELECT lang, term, doc_freq, total_count,
         row_number() OVER (
           PARTITION BY lang ORDER BY doc_freq DESC, term ASC
         ) AS rank
  FROM terms
)
SELECT lang, term, doc_freq::BIGINT AS doc_freq,
       total_count::BIGINT AS total_count, rank::INT AS rank
FROM ranked WHERE rank <= 10
ORDER BY lang, rank
"""


def chunk_docs_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width token chunking with overlap (operators/text.py:
    chunk_fixed): 12-token windows stepping by 8 (4-token overlap) —
    the RAG/embedding-index chunker. One generator over sequence
    starts + 1-based array slices; zero shuffles."""
    _prep(spark)
    from energy_pandas_spark.operators.text import chunk_fixed

    docs = _t(spark, sf_dir, "documents")
    return chunk_fixed(docs, size=12, overlap=4).orderBy("doc_id", "chunk_idx")


_CHUNK_FIXED_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     x -> x != '') AS t
  FROM documents
)
SELECT doc_id,
       (s // 8)::BIGINT AS chunk_idx,
       array_to_string(t[s + 1 : s + 12], ' ') AS chunk_text,
       least(12, len(t) - s)::BIGINT AS n_chunk_tokens
FROM toks, LATERAL (SELECT unnest(range(0, len(t), 8)) AS s)
WHERE len(t) > 0
ORDER BY doc_id, chunk_idx
"""


def chunk_docs_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-window chunking (operators/text.py:chunk_sentences —
    the third RAG chunker): 3-sentence windows stepping by 2, case
    preserved, boundaries from the shared SENTENCE_RE heuristic. The
    corpus has no sentence marks, so each document gets a
    deterministic punctuated tail appended (text becomes the first
    sentence; windows genuinely slide). Map-only array expressions —
    the oracle runs the literal same regex."""
    _prep(spark)
    from energy_pandas_spark.operators.text import chunk_sentences

    docs = _t(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(". Fin alpha! Fin beta? Tail closes"),
        ).alias("text"),
    )
    return chunk_sentences(injected, size=3, overlap=1).orderBy(
        "doc_id", "chunk_idx"
    )


_CHUNK_SENTENCES_SQL = r"""
WITH inj AS (
  SELECT doc_id,
         coalesce(text, '') || '. Fin alpha! Fin beta? Tail closes' AS text
  FROM documents
), sents AS (
  SELECT doc_id,
         list_filter(list_transform(
           regexp_extract_all(text, '[^.!?]+[.!?]*'),
           s -> trim(s)), x -> x != '') AS t
  FROM inj
)
SELECT doc_id,
       (s // 2)::BIGINT AS chunk_idx,
       array_to_string(t[s + 1 : s + 3], ' ') AS chunk_text,
       least(3, len(t) - s)::BIGINT AS n_sentences
FROM sents, LATERAL (SELECT unnest(range(0, len(t), 2)) AS s)
WHERE len(t) > 0
ORDER BY doc_id, chunk_idx
"""


def chunk_docs_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (operators/text.py:chunk_documents):
    boundary after token w iff md5-bucket(w) % 16 == 0 — expected
    16-token chunks whose boundaries survive edits elsewhere in the
    doc. Map-only array expressions; only the trailing chunk can be
    empty, so Spark's compacted chunk indices equal the oracle's
    enumeration."""
    _prep(spark)
    from energy_pandas_spark.operators.text import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(docs, target_tokens=16).orderBy(
        "doc_id", "chunk_idx"
    )


_CHUNK_CDC_SQL = r"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')
           AS toks
  FROM documents
), s AS (
  SELECT doc_id, toks,
         list_concat([1],
           [p + 1 FOR p IN bpos]) AS starts,
         list_concat(bpos, [len(toks)]) AS ends
  FROM (
    SELECT doc_id, toks,
           [i FOR i IN range(1, len(toks) + 1)
            IF ('0x' || substr(md5('cdc-v1' || toks[i]), 1, 15))::BIGINT
               % 16 = 0] AS bpos
    FROM t WHERE len(toks) > 0
  )
)
SELECT doc_id, (k - 1)::INT AS chunk_idx,
       array_to_string(toks[starts[k]:ends[k]], ' ') AS chunk_text,
       (ends[k] - starts[k] + 1)::BIGINT AS n_tokens
FROM s, unnest(range(1, len(starts) + 1)) AS u(k)
WHERE ends[k] - starts[k] + 1 > 0
ORDER BY doc_id, chunk_idx
"""


def line_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style cross-document LINE dedup (operators/text.py:line_dedup):
    documents are deterministically re-lined into 8-token rows, then
    every normalized non-blank line occurring 2+ times corpus-wide
    keeps only its smallest-(doc, idx) occurrence; each document's
    text is rebuilt from its surviving lines. The planted exact-dup
    documents lose all their lines to their originals, so the dedup
    path is genuinely exercised. Winner selection is a digest-keyed
    map-combined aggregate shipping two longs per distinct line."""
    _prep(spark)
    from energy_pandas_spark.functions.textfns import tokens
    from energy_pandas_spark.operators.text import line_dedup

    docs = _t(spark, sf_dir, "documents")
    lined = docs.select(
        "doc_id", tokens(F.coalesce(F.col("text"), F.lit(""))).alias("__tk")
    ).select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(
                        F.ceil(F.size("__tk") / F.lit(8.0)).cast("int"), F.lit(1)
                    ),
                ),
                lambda i: F.array_join(
                    F.slice("__tk", (i - F.lit(1)) * F.lit(8) + F.lit(1), F.lit(8)),
                    " ",
                ),
            ),
            "\n",
        ).alias("text"),
    )
    return (
        line_dedup(lined)
        .select("doc_id", "n_lines_kept", F.col("text").alias("text_out"))
        .orderBy("doc_id")
    )


_LINE_DEDUP_SQL = r"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     x -> x != '') AS toks
  FROM documents
), lines AS (
  SELECT doc_id, i::INT - 1 AS idx,
         array_to_string(toks[(i-1)*8+1:(i-1)*8+8], ' ') AS line
  FROM tk, unnest(range(1, greatest(ceil(len(toks)/8.0)::INT, 1) + 1)) AS u(i)
), keyed AS (
  SELECT doc_id, idx, line,
         CASE WHEN trim(regexp_replace(lower(line), '\s+', ' ', 'g')) != ''
              THEN trim(regexp_replace(lower(line), '\s+', ' ', 'g')) END AS key,
         doc_id * 1000000 + idx AS pos
  FROM lines
), win AS (
  SELECT key, min(pos) AS win, count(*) AS c
  FROM keyed WHERE key IS NOT NULL GROUP BY 1
), kept AS (
  SELECT k.doc_id, k.idx, k.line
  FROM keyed k LEFT JOIN win w ON k.key = w.key
  WHERE k.key IS NULL OR w.c = 1 OR k.pos = w.win
), agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_lines_kept,
         string_agg(line, chr(10) ORDER BY idx) AS text_out
  FROM kept GROUP BY 1
)
SELECT d.doc_id, coalesce(a.n_lines_kept, 0)::BIGINT AS n_lines_kept,
       coalesce(a.text_out, '') AS text_out
FROM documents d LEFT JOIN agg a USING (doc_id)
ORDER BY doc_id
"""


def line_dedup_in_doc_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document line dedup (operators/text.py:line_dedup_in_doc,
    a zero-shuffle map-only projection). The corpus has no natural
    within-doc repeated 8-token lines, so the query plants one: each
    document's first line is appended again at the end — the dedup
    must remove exactly that copy (blank first lines survive, blanks
    are structure)."""
    _prep(spark)
    from energy_pandas_spark.functions.textfns import tokens
    from energy_pandas_spark.operators.text import line_dedup_in_doc

    docs = _t(spark, sf_dir, "documents")
    lined = docs.select(
        "doc_id", tokens(F.coalesce(F.col("text"), F.lit(""))).alias("__tk")
    ).select(
        "doc_id",
        F.transform(
            F.sequence(
                F.lit(1),
                F.greatest(
                    F.ceil(F.size("__tk") / F.lit(8.0)).cast("int"), F.lit(1)
                ),
            ),
            lambda i: F.array_join(
                F.slice("__tk", (i - F.lit(1)) * F.lit(8) + F.lit(1), F.lit(8)),
                " ",
            ),
        ).alias("__lines"),
    ).select(
        "doc_id",
        F.array_join(
            F.concat(F.col("__lines"), F.slice("__lines", 1, 1)), "\n"
        ).alias("text"),
    )
    return (
        line_dedup_in_doc(lined)
        .select("doc_id", "n_lines_kept", F.col("text").alias("text_out"))
        .orderBy("doc_id")
    )


_LINE_DEDUP_IN_DOC_SQL = r"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     x -> x != '') AS toks
  FROM documents
), lined AS (
  SELECT doc_id,
         [array_to_string(toks[(i-1)*8+1:(i-1)*8+8], ' ')
          FOR i IN range(1, greatest(ceil(len(toks)/8.0)::INT, 1) + 1)]
           AS ls
  FROM tk
), planted AS (
  SELECT doc_id, list_concat(ls, ls[1:1]) AS ls FROM lined
), normed AS (
  SELECT doc_id, ls,
         list_transform(ls, l -> trim(regexp_replace(lower(l), '\s+', ' ', 'g')))
           AS ns
  FROM planted
), kept AS (
  SELECT doc_id,
         list_filter(ls, (l, i) -> ns[i] = ''
                     OR list_position(ns, ns[i]) = i) AS ks
  FROM normed
)
SELECT doc_id, len(ks)::BIGINT AS n_lines_kept,
       array_to_string(ks, chr(10)) AS text_out
FROM kept
ORDER BY doc_id
"""


def curate_corpus_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deep composed pipeline, fully oracle-checked end-to-end:
    Gopher rule gate -> 8-token re-lining -> corpus-wide line dedup
    (keep-first) -> drop emptied docs -> exact dedup on the REBUILT
    text (smallest id per digest) -> one-row corpus report
    (n_docs, id_sum, total_tokens). Every stage is an operator the
    registry also verifies in isolation; this query verifies their
    COMPOSITION — where stage-boundary bugs (schema drift, null
    leaks, order dependence) would hide."""
    _prep(spark)
    from energy_pandas_spark.functions.textfns import tokens
    from energy_pandas_spark.operators.text import gopher_rules, line_dedup

    docs = _t(spark, sf_dir, "documents")
    gated = (
        gopher_rules(
            docs,
            min_words=55,
            required_stopwords=("the", "a", "value", "table"),
            min_stopword_hits=2,
        )
        .filter(F.col("passes_gopher"))
        .select("doc_id", "text")
    )
    lined = gated.select(
        "doc_id", tokens(F.coalesce(F.col("text"), F.lit(""))).alias("__tk")
    ).select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(
                        F.ceil(F.size("__tk") / F.lit(8.0)).cast("int"), F.lit(1)
                    ),
                ),
                lambda i: F.array_join(
                    F.slice("__tk", (i - F.lit(1)) * F.lit(8) + F.lit(1), F.lit(8)),
                    " ",
                ),
            ),
            "\n",
        ).alias("text"),
    )
    from pyspark import StorageLevel

    # the rebuilt corpus feeds BOTH the digest-winner aggregate and the
    # final semi-join; persist it or the whole line-dedup subtree runs
    # twice (the same exchange-reuse trap line_dedup guards internally)
    deduped_lines = track_cache(
        line_dedup(lined, drop_empty=True)
        .select("doc_id", "text")
        .persist(StorageLevel.MEMORY_AND_DISK_DESER)
    )
    digest = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    )
    win = (
        deduped_lines
        .withColumn("__d", digest)
        .groupBy("__d")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    kept = deduped_lines.join(win.select("doc_id"), "doc_id", "left_semi")
    return kept.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(F.sum("doc_id"), F.lit(0)).cast("long").alias("id_sum"),
        F.coalesce(
            F.sum(F.size(tokens(F.col("text")))), F.lit(0)
        )
        .cast("long")
        .alias("total_tokens"),
    )


_CURATE_SQL = r"""
WITH m AS (
  SELECT doc_id, coalesce(text, '') AS t,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     x -> x != '') AS toks
  FROM documents
), gate AS (
  SELECT doc_id, toks FROM (
    SELECT doc_id, toks,
           len(toks) AS n_words,
           coalesce(list_sum(list_transform(toks, w -> length(w))), 0)
             AS word_chars,
           ((length(t) - length(replace(t, '#', '')))
            + (length(t) - length(replace(t, '...', ''))) / 3
            + (length(t) - length(replace(t, '…', '')))) AS symbols,
           len(list_filter(toks, w -> regexp_matches(w, '\p{L}')))
             AS alpha_words,
           len(list_intersect(list_distinct(toks),
                              ['the', 'a', 'value', 'table'])) AS stop_hits,
           len(string_split(t, chr(10))) AS n_lines,
           len(list_filter(string_split(t, chr(10)),
               l -> regexp_matches(ltrim(l), '^[-*•]'))) AS bullet_lines,
           len(list_filter(string_split(t, chr(10)),
               l -> regexp_matches(rtrim(l), '(\.\.\.|…)$'))) AS ell_lines
    FROM m
  )
  WHERE (n_words >= 55 AND n_words <= 100000)
    AND (word_chars >= 3.0 * n_words AND word_chars <= 10.0 * n_words
         AND n_words > 0)
    AND (symbols <= 0.1 * n_words)
    AND (bullet_lines <= 0.9 * n_lines)
    AND (ell_lines <= 0.3 * n_lines)
    AND (alpha_words >= 0.8 * n_words AND n_words > 0)
    AND (stop_hits >= 2)
), lines AS (
  SELECT doc_id, i::INT - 1 AS idx,
         array_to_string(toks[(i-1)*8+1:(i-1)*8+8], ' ') AS line
  FROM gate, unnest(range(1, greatest(ceil(len(toks)/8.0)::INT, 1) + 1)) AS u(i)
), keyed AS (
  SELECT doc_id, idx, line,
         CASE WHEN trim(regexp_replace(lower(line), '\s+', ' ', 'g')) != ''
              THEN trim(regexp_replace(lower(line), '\s+', ' ', 'g')) END AS key,
         doc_id * 1000000 + idx AS pos
  FROM lines
), lwin AS (
  SELECT key, min(pos) AS win, count(*) AS c
  FROM keyed WHERE key IS NOT NULL GROUP BY 1
), keptl AS (
  SELECT k.doc_id, k.idx, k.line
  FROM keyed k LEFT JOIN lwin w ON k.key = w.key
  WHERE k.key IS NULL OR w.c = 1 OR k.pos = w.win
), rebuilt AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY idx) AS text
  FROM keptl GROUP BY 1
), nonempty AS (
  SELECT doc_id, text FROM rebuilt WHERE trim(text) != ''
), dwin AS (
  SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS d,
         min(doc_id) AS doc_id
  FROM nonempty GROUP BY 1
)
SELECT count(*)::BIGINT AS n_docs,
       coalesce(sum(n.doc_id), 0)::BIGINT AS id_sum,
       coalesce(sum(len(list_filter(string_split_regex(lower(n.text), '\s+'),
                                    x -> x != ''))), 0)::BIGINT AS total_tokens
FROM nonempty n JOIN dwin ON dwin.doc_id = n.doc_id
"""


def line_dup_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus line-repetition audit (operators/text.py:
    line_dup_stats) over the same deterministic 8-token re-lining the
    line-dedup query uses — one digest-keyed hash aggregate."""
    _prep(spark)
    from energy_pandas_spark.functions.textfns import tokens
    from energy_pandas_spark.operators.text import line_dup_stats

    docs = _t(spark, sf_dir, "documents")
    lined = docs.select(
        "doc_id", tokens(F.coalesce(F.col("text"), F.lit(""))).alias("__tk")
    ).select(
        "doc_id",
        F.array_join(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest(
                        F.ceil(F.size("__tk") / F.lit(8.0)).cast("int"), F.lit(1)
                    ),
                ),
                lambda i: F.array_join(
                    F.slice("__tk", (i - F.lit(1)) * F.lit(8) + F.lit(1), F.lit(8)),
                    " ",
                ),
            ),
            "\n",
        ).alias("text"),
    )
    return line_dup_stats(lined).select(
        "n_lines", "n_distinct_lines", "n_dup_lines",
        "dup_occurrence_micro", "n_blank_lines",
    )


_LINE_DUP_STATS_SQL = r"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     x -> x != '') AS toks
  FROM documents
), lines AS (
  SELECT doc_id,
         array_to_string(toks[(i-1)*8+1:(i-1)*8+8], ' ') AS line
  FROM tk, unnest(range(1, greatest(ceil(len(toks)/8.0)::INT, 1) + 1)) AS u(i)
), keyed AS (
  SELECT CASE WHEN trim(regexp_replace(lower(line), '\s+', ' ', 'g')) != ''
              THEN trim(regexp_replace(lower(line), '\s+', ' ', 'g')) END AS key
  FROM lines
), per AS (
  SELECT key, count(*) AS c FROM keyed WHERE key IS NOT NULL GROUP BY 1
)
SELECT coalesce(sum(c), 0)::BIGINT AS n_lines,
       count(*)::BIGINT AS n_distinct_lines,
       coalesce(sum((c >= 2)::INT), 0)::BIGINT AS n_dup_lines,
       (coalesce(sum(c - 1), 0) * 1000000
        // greatest(coalesce(sum(c), 0), 1))::BIGINT AS dup_occurrence_micro,
       (SELECT count(*) FROM keyed WHERE key IS NULL)::BIGINT AS n_blank_lines
FROM per
"""


def dsir_select_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance selection (operators/text.py:dsir_weights/
    dsir_select): hashed-unigram Laplace log-ratio weights of the
    English-language slice (target domain) vs the whole corpus,
    quantized to integer 1/1024-nat units so document importances are
    exact BIGINT sums — order-free, engine-portable. Returns the
    top-100 documents by quantized importance (id tiebreak)."""
    _prep(spark)
    from energy_pandas_spark.operators.text import dsir_select, dsir_weights

    docs = _t(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")
    w = dsir_weights(docs, target, n_buckets=4096, scale=1024)
    return dsir_select(docs, w, k=100, n_buckets=4096, scale=1024).select(
        "doc_id", "importance_q", "n_tokens", "score"
    )


_DSIR_SQL = r"""
WITH rtok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                            x -> x != '')) AS t
  FROM documents
), dt AS (
  SELECT doc_id,
         (('0x' || substr(md5('dsir-v1' || t), 1, 15))::BIGINT % 4096)::INT
           AS bucket
  FROM rtok
), rc AS (
  SELECT bucket, count(*) AS c FROM dt GROUP BY 1
), tc AS (
  SELECT bucket, count(*) AS c
  FROM dt JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY 1
), tot AS (
  SELECT (SELECT coalesce(sum(c), 0) FROM tc) AS T,
         (SELECT coalesce(sum(c), 0) FROM rc) AS R
), w AS (
  SELECT b.bucket::INT AS bucket,
         round(1024 * (ln((coalesce(tc.c, 0) + 1) / (tot.T + 4096))
                       - ln((coalesce(rc.c, 0) + 1) / (tot.R + 4096))))::BIGINT
           AS iw
  FROM range(4096) AS b(bucket)
  CROSS JOIN tot
  LEFT JOIN tc ON tc.bucket = b.bucket
  LEFT JOIN rc ON rc.bucket = b.bucket
), per AS (
  SELECT d.doc_id,
         coalesce(sum(w.iw), 0)::BIGINT AS importance_q,
         count(dt.bucket)::BIGINT AS n_tokens
  FROM documents d
  LEFT JOIN dt ON dt.doc_id = d.doc_id
  LEFT JOIN w ON w.bucket = dt.bucket
  GROUP BY 1
)
SELECT doc_id, importance_q, n_tokens,
       round(importance_q / (1024.0 * greatest(n_tokens, 1)), 6) AS score
FROM per
ORDER BY importance_q DESC, doc_id ASC
LIMIT 100
"""


def dsir_resample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR Gumbel-top-k RESAMPLING (operators/text.py:dsir_resample):
    keep probability ∝ exp(importance/τ) via deterministic Gumbel
    noise — u from the md5 bucket of the id, key quantized to BIGINT
    1/1024-nat units so membership is an integer total order."""
    _prep(spark)
    from energy_pandas_spark.operators.text import dsir_resample, dsir_weights

    docs = _t(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")
    w = dsir_weights(docs, target, n_buckets=4096, scale=1024)
    return dsir_resample(
        docs, w, k=100, temperature=2.0, n_buckets=4096, scale=1024
    ).select("doc_id", "importance_q", "gumbel_key_q")


_DSIR_RESAMPLE_SQL = r"""
WITH rtok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                            x -> x != '')) AS t
  FROM documents
), dt AS (
  SELECT doc_id,
         (('0x' || substr(md5('dsir-v1' || t), 1, 15))::BIGINT % 4096)::INT
           AS bucket
  FROM rtok
), rc AS (
  SELECT bucket, count(*) AS c FROM dt GROUP BY 1
), tc AS (
  SELECT bucket, count(*) AS c
  FROM dt JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY 1
), tot AS (
  SELECT (SELECT coalesce(sum(c), 0) FROM tc) AS T,
         (SELECT coalesce(sum(c), 0) FROM rc) AS R
), w AS (
  SELECT b.bucket::INT AS bucket,
         round(1024 * (ln((coalesce(tc.c, 0) + 1) / (tot.T + 4096))
                       - ln((coalesce(rc.c, 0) + 1) / (tot.R + 4096))))::BIGINT
           AS iw
  FROM range(4096) AS b(bucket)
  CROSS JOIN tot
  LEFT JOIN tc ON tc.bucket = b.bucket
  LEFT JOIN rc ON rc.bucket = b.bucket
), per AS (
  SELECT d.doc_id,
         coalesce(sum(w.iw), 0)::BIGINT AS importance_q
  FROM documents d
  LEFT JOIN dt ON dt.doc_id = d.doc_id
  LEFT JOIN w ON w.bucket = dt.bucket
  GROUP BY 1
), keyed AS (
  SELECT doc_id, importance_q,
         round(importance_q / 2.0
               + 1024 * -ln(-ln(((('0x' || substr(md5('dsir-g1' || doc_id::VARCHAR),
                                                  1, 15))::BIGINT % 1048576)
                                 + 0.5) / 1048576.0)))::BIGINT AS gumbel_key_q
  FROM per
)
SELECT doc_id, importance_q, gumbel_key_q
FROM keyed
ORDER BY gumbel_key_q DESC, doc_id ASC
LIMIT 100
"""


def dsir_bigram_select_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR with the paper's full feature space — hashed unigrams AND
    adjacent bigrams (ngram_max=2) — greedy top-100 selection; same
    integer-quantized weight algebra as dsir_select_docs."""
    _prep(spark)
    from energy_pandas_spark.operators.text import dsir_select, dsir_weights

    docs = _t(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")
    w = dsir_weights(docs, target, n_buckets=4096, scale=1024, ngram_max=2)
    return dsir_select(
        docs, w, k=100, n_buckets=4096, scale=1024, ngram_max=2
    ).select("doc_id", "importance_q", "n_tokens", "score")


_DSIR_BIGRAM_SQL = r"""
WITH tk AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     x -> x != '') AS toks
  FROM documents
), feats AS (
  SELECT doc_id,
         unnest(list_concat(
           toks,
           [toks[i] || ' ' || toks[i+1] FOR i IN range(1, len(toks))]
         )) AS t
  FROM tk
), dt AS (
  SELECT doc_id,
         (('0x' || substr(md5('dsir-v1' || t), 1, 15))::BIGINT % 4096)::INT
           AS bucket
  FROM feats
), rc AS (
  SELECT bucket, count(*) AS c FROM dt GROUP BY 1
), tc AS (
  SELECT bucket, count(*) AS c
  FROM dt JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY 1
), tot AS (
  SELECT (SELECT coalesce(sum(c), 0) FROM tc) AS T,
         (SELECT coalesce(sum(c), 0) FROM rc) AS R
), w AS (
  SELECT b.bucket::INT AS bucket,
         round(1024 * (ln((coalesce(tc.c, 0) + 1) / (tot.T + 4096))
                       - ln((coalesce(rc.c, 0) + 1) / (tot.R + 4096))))::BIGINT
           AS iw
  FROM range(4096) AS b(bucket)
  CROSS JOIN tot
  LEFT JOIN tc ON tc.bucket = b.bucket
  LEFT JOIN rc ON rc.bucket = b.bucket
), per AS (
  SELECT d.doc_id,
         coalesce(sum(w.iw), 0)::BIGINT AS importance_q,
         count(dt.bucket)::BIGINT AS n_tokens
  FROM documents d
  LEFT JOIN dt ON dt.doc_id = d.doc_id
  LEFT JOIN w ON w.bucket = dt.bucket
  GROUP BY 1
)
SELECT doc_id, importance_q, n_tokens,
       round(importance_q / (1024.0 * greatest(n_tokens, 1)), 6) AS score
FROM per
ORDER BY importance_q DESC, doc_id ASC
LIMIT 100
"""


def gopher_rules_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule-pack audit (operators/text.py:gopher_rules): every
    signal is an integer count from one map-only array projection;
    ratio rules compare count <= threshold * count with the identical
    IEEE expression on both engines. Thresholds tuned so the synthetic
    corpus splits on word count and on the stopword rule."""
    _prep(spark)
    from energy_pandas_spark.operators.text import gopher_rules

    docs = _t(spark, sf_dir, "documents")
    return (
        gopher_rules(
            docs,
            min_words=55,
            required_stopwords=("the", "a", "value", "table"),
            min_stopword_hits=2,
        )
        .select(
            "doc_id",
            "n_words",
            "mean_word_len_micro",
            "n_symbol_chars",
            "n_alpha_words",
            "n_stopword_hits",
            "r_word_count",
            "r_mean_word_len",
            "r_symbol_ratio",
            "r_alpha_words",
            "r_stopwords",
            "passes_gopher",
        )
        .orderBy("doc_id")
    )


_GOPHER_SQL = r"""
WITH c AS (
  SELECT doc_id,
         coalesce(text, '') AS t,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     x -> x != '') AS toks
  FROM documents
), m AS (
  SELECT doc_id,
         len(toks) AS n_words,
         coalesce(list_sum(list_transform(toks, w -> length(w))), 0)::BIGINT
           AS word_chars,
         ((length(t) - length(replace(t, '#', '')))
          + (length(t) - length(replace(t, '...', ''))) / 3
          + (length(t) - length(replace(t, '…', ''))))::BIGINT AS symbols,
         len(list_filter(toks, w -> regexp_matches(w, '\p{L}')))
           AS alpha_words,
         len(list_intersect(list_distinct(toks),
                            ['the', 'a', 'value', 'table'])) AS stop_hits,
         len(string_split(t, chr(10))) AS n_lines,
         len(list_filter(string_split(t, chr(10)),
             l -> regexp_matches(ltrim(l), '^[-*•]'))) AS bullet_lines,
         len(list_filter(string_split(t, chr(10)),
             l -> regexp_matches(rtrim(l), '(\.\.\.|…)$'))) AS ell_lines
  FROM c
)
SELECT doc_id,
       n_words::BIGINT AS n_words,
       (CASE WHEN n_words = 0 THEN 0
             ELSE (word_chars * 1000000) // n_words END)::BIGINT
         AS mean_word_len_micro,
       symbols AS n_symbol_chars,
       alpha_words::BIGINT AS n_alpha_words,
       stop_hits::BIGINT AS n_stopword_hits,
       (n_words >= 55 AND n_words <= 100000) AS r_word_count,
       (word_chars >= 3.0 * n_words AND word_chars <= 10.0 * n_words
        AND n_words > 0) AS r_mean_word_len,
       (symbols <= 0.1 * n_words) AS r_symbol_ratio,
       (alpha_words >= 0.8 * n_words AND n_words > 0) AS r_alpha_words,
       (stop_hits >= 2) AS r_stopwords,
       ((n_words >= 55 AND n_words <= 100000)
        AND (word_chars >= 3.0 * n_words AND word_chars <= 10.0 * n_words
             AND n_words > 0)
        AND (symbols <= 0.1 * n_words)
        AND (bullet_lines <= 0.9 * n_lines)
        AND (ell_lines <= 0.3 * n_lines)
        AND (alpha_words >= 0.8 * n_words AND n_words > 0)
        AND (stop_hits >= 2)) AS passes_gopher
FROM m
ORDER BY doc_id
"""


def unigram_vocab_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer training (operators/unigram.py:
    train_unigram — the SentencePiece-family twin of the BPE trainer):
    one corpus scan for word counts, then hard-EM Viterbi iterations
    on the vocab-sized word table with integer-quantized log-probs.
    Rows-only BY DESIGN (iterative, outside single-statement SQL);
    correctness is pinned by tests/test_unigram.py — a full
    pure-Python EM replay and local/distributed bit-equality."""
    _prep(spark)
    from energy_pandas_spark.operators.unigram import train_unigram

    docs = _t(spark, sf_dir, "documents")
    return train_unigram(docs, vocab_size=200, n_iter=2)


def bpe_merges_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (operators/bpe.py:train_bpe):
    the corpus is scanned ONCE for word counts; 16 merge iterations
    then run on the vocab-sized word table with a deterministic
    (count desc, pair asc) argmax. PROMOTED to oracle-backed in r6
    (the domain_rank unrolled-CTE idiom): all 16 rounds replay in one
    DuckDB statement — per round, a pair-count aggregate, the argmax,
    and the greedy left-to-right non-overlapping merge as a
    list_reduce over singleton-wrapped symbols (the accumulator must
    be LIST<VARCHAR>, and DuckDB's list_reduce types the accumulator
    as the element type). Every CTE is MATERIALIZED: the chain
    references each state twice, and DuckDB's default inlining makes
    that 2^16 copies of the corpus scan. tests/test_bpe.py separately
    pins both trainer paths against a pure-Python reference."""
    _prep(spark)
    from energy_pandas_spark.operators.bpe import train_bpe

    docs = _t(spark, sf_dir, "documents")
    return train_bpe(docs, num_merges=16).orderBy("rank")


def _bpe_merges_sql(num_merges: int = 16) -> str:
    """Unrolled-CTE replay of the BPE trainer (see bpe_merges_docs)."""
    parts = [
        r"""
WITH wc AS (
  SELECT word, count(*)::BIGINT AS cnt
  FROM (
    SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                              x -> x != '')) AS word
    FROM documents
  ) GROUP BY 1
), s0 AS MATERIALIZED (
  SELECT string_split(word, '') || ['</w>'] AS syms, cnt FROM wc
)"""
    ]
    for i in range(num_merges):
        parts.append(f""", p{i} AS MATERIALIZED (
  SELECT t.u.l AS l, t.u.r AS r, sum(cnt)::BIGINT AS c
  FROM s{i}, unnest([{{'l': syms[j], 'r': syms[j+1]}}
                     FOR j IN range(1, len(syms))]) AS t(u)
  GROUP BY 1, 2
), b{i} AS MATERIALIZED (
  SELECT l, r, c FROM p{i} WHERE c >= 2
  ORDER BY c DESC, l ASC, r ASC LIMIT 1
), s{i + 1} AS MATERIALIZED (
  SELECT CASE WHEN b.l IS NULL THEN s.syms
         ELSE list_reduce([[x] FOR x IN s.syms],
              (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l
                               AND x[1] = b.r
                          THEN acc[:len(acc)-1] || [b.l || b.r]
                          ELSE acc || x END)
         END AS syms, s.cnt AS cnt
  FROM s{i} s LEFT JOIN b{i} b ON TRUE
)""")
    sel = "\nUNION ALL\n".join(
        f'SELECT {i}::BIGINT AS rank, l AS "left", r AS "right",'
        f" l || r AS merged, c AS pair_count FROM b{i}"
        for i in range(num_merges)
    )
    parts.append("\n" + sel + "\nORDER BY rank")
    return "".join(parts)


def wordpiece_merges_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed WordPiece tokenizer training (operators/
    wordpiece.py:train_wordpiece — the BERT-family trainer completing
    the BPE/unigram/WordPiece trio): one corpus scan for word counts,
    then 16 likelihood-scored merge iterations on the vocab-sized
    word table (score = count(pair)/(count(l)*count(r)), one shared
    IEEE expression, argmax tiebroken (left, right) asc). PROMOTED to
    oracle-backed in r6 (the same unrolled-MATERIALIZED-CTE replay as
    bpe_merges_docs, plus a per-round symbol-count aggregate feeding
    the likelihood score — a single division of exact integers, so
    the double is correctly rounded identically on both engines).
    tests/test_wordpiece.py separately pins both trainer paths
    against an independent pure-Python reference."""
    _prep(spark)
    from energy_pandas_spark.operators.wordpiece import train_wordpiece

    docs = _t(spark, sf_dir, "documents")
    return train_wordpiece(docs, num_merges=16).orderBy("rank")


def _wordpiece_merges_sql(num_merges: int = 16) -> str:
    """Unrolled-CTE replay of the WordPiece trainer (see
    wordpiece_merges_docs)."""
    parts = [
        r"""
WITH wc AS (
  SELECT word, count(*)::BIGINT AS cnt
  FROM (
    SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                              x -> x != '')) AS word
    FROM documents
  ) GROUP BY 1
), s0 AS MATERIALIZED (
  SELECT CASE WHEN length(word) <= 1 THEN [word]
         ELSE [substr(word, 1, 1)]
              || ['##' || c FOR c IN string_split(substr(word, 2), '')]
         END AS syms, cnt
  FROM wc
)"""
    ]
    for i in range(num_merges):
        parts.append(f""", u{i} AS MATERIALIZED (
  SELECT t.s AS sym, sum(cnt)::BIGINT AS c
  FROM s{i}, unnest(syms) AS t(s) GROUP BY 1
), p{i} AS MATERIALIZED (
  SELECT t.u.l AS l, t.u.r AS r, sum(cnt)::BIGINT AS c
  FROM s{i}, unnest([{{'l': syms[j], 'r': syms[j+1]}}
                     FOR j IN range(1, len(syms))]) AS t(u)
  GROUP BY 1, 2
), b{i} AS MATERIALIZED (
  SELECT p.l, p.r, p.c,
         p.c::DOUBLE / (ul.c::DOUBLE * ur.c::DOUBLE) AS score,
         p.l || (CASE WHEN p.r LIKE '##%' THEN substr(p.r, 3)
                      ELSE p.r END) AS m
  FROM p{i} p
  JOIN u{i} ul ON ul.sym = p.l
  JOIN u{i} ur ON ur.sym = p.r
  WHERE p.c >= 2
  ORDER BY score DESC, p.l ASC, p.r ASC LIMIT 1
), s{i + 1} AS MATERIALIZED (
  SELECT CASE WHEN b.l IS NULL THEN s.syms
         ELSE list_reduce([[x] FOR x IN s.syms],
              (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = b.l
                               AND x[1] = b.r
                          THEN acc[:len(acc)-1] || [b.m]
                          ELSE acc || x END)
         END AS syms, s.cnt AS cnt
  FROM s{i} s LEFT JOIN b{i} b ON TRUE
)""")
    sel = "\nUNION ALL\n".join(
        f'SELECT {i}::BIGINT AS rank, l AS "left", r AS "right",'
        f" m AS merged, c AS pair_count, score FROM b{i}"
        for i in range(num_merges)
    )
    parts.append("\n" + sel + "\nORDER BY rank")
    return "".join(parts)


def corpus_report_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus data card (operators/pipeline.py:corpus_report):
    volume, breadth, exact-dup rate, empty docs — one aggregate pass."""
    _prep(spark)
    from energy_pandas_spark.operators.pipeline import corpus_report

    docs = _t(spark, sf_dir, "documents")
    # micro integer ratios instead of rounded floats (round-at-tie
    # class, SURVEY r5 addendum)
    return corpus_report(docs).select(
        "n_docs", "total_tokens", "total_chars", "n_unique_contents",
        "n_empty_docs", "n_langs", "n_sources",
        "dup_ratio_micro", "avg_tokens_micro",
    )


_CORPUS_REPORT_SQL = """
SELECT count(*) AS n_docs,
       coalesce(sum(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                    x -> x != ''))), 0)::BIGINT AS total_tokens,
       coalesce(sum(length(text)), 0)::BIGINT AS total_chars,
       count(DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))))
         AS n_unique_contents,
       coalesce(sum((len(list_filter(string_split_regex(lower(text), '\\s+'),
                                     x -> x != '')) = 0)::BIGINT), 0)::BIGINT
         AS n_empty_docs,
       count(DISTINCT lang) AS n_langs,
       count(DISTINCT source) AS n_sources,
       ((count(*) - count(DISTINCT md5(trim(regexp_replace(lower(text),
                 '\\s+', ' ', 'g'))))) * 1000000
        // greatest(count(*), 1))::BIGINT AS dup_ratio_micro,
       (coalesce(sum(len(list_filter(string_split_regex(lower(text),
                 '\\s+'), x -> x != ''))), 0) * 1000000
        // greatest(count(*), 1))::BIGINT AS avg_tokens_micro
FROM documents
"""


def corpus_diff_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff audit (operators/pipeline.py:corpus_diff_stats):
    old = documents; new = documents with every 7th id removed, every
    11th text amended, and every 13th re-added under a shifted id —
    the counts-per-status of the delta. Each side reduces map-side to
    (id, digest-long) before the single full-outer equi-join; text
    never shuffles."""
    _prep(spark)
    from energy_pandas_spark.operators.pipeline import corpus_diff_stats

    docs = _t(spark, sf_dir, "documents")
    changed = docs.filter(F.col("doc_id") % 7 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" changed"))
        ).otherwise(F.col("text")),
    )
    added = docs.filter(F.col("doc_id") % 13 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    new = changed.unionByName(added)
    return corpus_diff_stats(docs, new).orderBy("status")


_CORPUS_DIFF_SQL = r"""
WITH old AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g')))
           AS d
  FROM documents
), new_src AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0 THEN text || ' changed' ELSE text END AS text
  FROM documents WHERE doc_id % 7 != 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 13 = 0
), new AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g')))
           AS d
  FROM new_src
), j AS (
  SELECT o.d AS od, n.d AS nd
  FROM old o FULL JOIN new n ON o.doc_id = n.doc_id
)
SELECT status, count(*)::BIGINT AS n FROM (
  SELECT CASE WHEN od IS NULL THEN 'added'
              WHEN nd IS NULL THEN 'removed'
              WHEN od = nd THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM j
)
GROUP BY 1 ORDER BY 1
"""


def exact_substring_scrub_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr scrubbing (operators/text.py:exact_substring_dedup):
    duplicated 8-token spans keep only their globally-first occurrence;
    later occurrences are CUT and documents rebuilt from surviving
    tokens — passage removal, not document dropping. All shuffles ship
    longs; the rebuild is an (id, pos)-keyed anti-join."""
    _prep(spark)
    from energy_pandas_spark.operators.text import exact_substring_dedup

    docs = _t(spark, sf_dir, "documents")
    return exact_substring_dedup(docs, k=8).select(
        "doc_id", "text", "n_tokens_before", "n_tokens_removed"
    ).orderBy("doc_id")


_EXACT_SUBSTRING_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     x -> x != '') AS t
  FROM documents
), spans AS (
  SELECT doc_id, i AS pos,
         ('0x' || substr(md5(array_to_string(t[i : i + 7], ' ')), 1, 15))::BIGINT
           AS h
  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(t) - 7, 0) + 1)) AS i)
), marked AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn,
         count(*) OVER (PARTITION BY h) AS c
  FROM spans
), covered AS (
  SELECT DISTINCT doc_id, pos + j AS ti
  FROM marked, LATERAL (SELECT unnest(range(0, 8)) AS j)
  WHERE c >= 2 AND rn > 1
), tokrows AS (
  SELECT doc_id, i AS ti, t[i] AS tok
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i)
), kept AS (
  SELECT tr.doc_id, tr.ti, tr.tok
  FROM tokrows tr LEFT JOIN covered cv
    ON cv.doc_id = tr.doc_id AND cv.ti = tr.ti
  WHERE cv.ti IS NULL
), rebuilt AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY ti) AS text_out,
         count(*) AS n_kept
  FROM kept GROUP BY 1
)
SELECT d.doc_id,
       coalesce(r.text_out, '') AS text,
       coalesce(len(tk.t), 0)::BIGINT AS n_tokens_before,
       (coalesce(len(tk.t), 0) - coalesce(r.n_kept, 0))::BIGINT
         AS n_tokens_removed
FROM documents d
JOIN toks tk ON tk.doc_id = d.doc_id
LEFT JOIN rebuilt r ON r.doc_id = d.doc_id
ORDER BY d.doc_id
"""


def distribution_shift_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample KS drift (operators/pipeline.py:distribution_shift)
    between the documents length distribution and a synthetic refresh
    (every 3rd doc lengthened, every 7th removed). Integer cumulative
    counts + correctly-rounded IEEE division make the statistic
    bit-identical across engines; the cumulative walk runs over the
    distinct-value count table."""
    _prep(spark)
    from energy_pandas_spark.operators.pipeline import distribution_shift

    docs = _t(spark, sf_dir, "documents")
    newer = docs.filter(F.col("doc_id") % 7 != 0).withColumn(
        "n_chars",
        F.when(F.col("doc_id") % 3 == 0, F.col("n_chars") + 40).otherwise(
            F.col("n_chars")
        ),
    )
    return distribution_shift(docs, newer, "n_chars")


_DISTRIBUTION_SHIFT_SQL = """
WITH o AS (
  SELECT n_chars AS v, count(*) AS ca FROM documents
  WHERE n_chars IS NOT NULL GROUP BY 1
), nn AS (
  SELECT v, count(*) AS cb FROM (
    SELECT CASE WHEN doc_id % 3 = 0 THEN n_chars + 40 ELSE n_chars END AS v
    FROM documents WHERE doc_id % 7 != 0
  ) WHERE v IS NOT NULL GROUP BY 1
), m AS (
  SELECT coalesce(o.v, nn.v) AS v,
         coalesce(o.ca, 0) AS ca, coalesce(nn.cb, 0) AS cb
  FROM o FULL JOIN nn ON o.v = nn.v
), t AS (
  SELECT sum(ca) AS n_old, sum(cb) AS n_new FROM m
), c AS (
  SELECT v,
         sum(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cuma,
         sum(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cumb
  FROM m
), g AS (
  SELECT v, abs(cuma / greatest(t.n_old, 1)
                - cumb / greatest(t.n_new, 1)) AS gap
  FROM c CROSS JOIN t
)
SELECT round((SELECT max(gap) FROM g), 6) AS ks_stat,
       (SELECT v FROM g ORDER BY gap DESC, v ASC LIMIT 1) AS at_value,
       t.n_old::BIGINT AS n_old, t.n_new::BIGINT AS n_new
FROM t
"""


def audio_features_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal AUDIO pipeline with the real stdlib codec: each
    document's bytes become a short 16-bit PCM WAV inside an Arrow
    batch (encode), then ``decode_features`` round-trips them through
    the registered WAV decoder + log-RMS energy extractor — rows-only
    (feature values are codec-defined, but deterministic end-to-end)."""
    _prep(spark)
    import numpy as np
    import pandas as pd

    from energy_pandas_spark.operators.codecs import (
        encode_wav,
        register_default_decoders,
    )
    from energy_pandas_spark.operators.multimodal import decode_features

    register_default_decoders()
    from energy_pandas_spark.util import spread_partitions

    # a single-file scan arrives as ONE partition; the render/decode
    # kernels are CPU-bound Python, so spread them across all cores
    docs = spread_partitions(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )

    def render(it):
        for pdf in it:
            content = []
            for text in pdf["text"]:
                raw = (text or "").encode("utf-8")[:800]
                # bytes -> crude waveform in [-1, 1]
                x = (
                    np.frombuffer(raw.ljust(800, b"\0"), np.uint8)
                    .astype(np.float64)
                    - 128.0
                ) / 128.0
                content.append(encode_wav(x, rate=8000))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "content": content,
                    "meta": [
                        {"mime": "audio/wav", "width": None, "height": None,
                         "duration_ms": 100}
                    ]
                    * len(pdf),
                }
            )

    media = docs.mapInPandas(
        render,
        schema=(
            "media_id long, content binary, "
            "meta struct<mime:string,width:int,height:int,duration_ms:bigint>"
        ),
    )
    return _feature_mean_64(decode_features(media, dim=64))


def video_features_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal VIDEO pipeline with the real stdlib GIF codec: each
    document's bytes render into a small deterministic animated GIF
    inside an Arrow batch (encode_gif), then ``decode_features``
    round-trips them through the registered video decoder — LZW
    decode, frame compositing, evenly-sampled luma block-mean features
    — rows-only (codec-defined values, deterministic end-to-end)."""
    _prep(spark)
    import numpy as np
    import pandas as pd

    from energy_pandas_spark.operators.codecs import (
        encode_gif,
        register_default_decoders,
    )
    from energy_pandas_spark.operators.multimodal import decode_features

    register_default_decoders()
    from energy_pandas_spark.util import spread_partitions

    # single-file scan -> ONE partition; the render/decode kernels are
    # CPU-bound Python, so spread them across all cores first
    docs = spread_partitions(
        _t(spark, sf_dir, "documents").select("doc_id", "text")
    )
    palette = np.array(
        [[0, 0, 0], [85, 85, 85], [170, 170, 170], [255, 255, 255]], np.uint8
    )

    def render(it):
        for pdf in it:
            content = []
            for text in pdf["text"]:
                raw = (text or "").encode("utf-8")[:192]
                # bytes -> 3 frames of 8x8 4-gray video
                idx = (
                    np.frombuffer(raw.ljust(192, b"\0"), np.uint8)
                    .reshape(3, 8, 8)
                    % 4
                )
                content.append(encode_gif(palette[idx], palette=palette))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "content": content,
                    "meta": [
                        {"mime": "video/gif", "width": 8, "height": 8,
                         "duration_ms": 300}
                    ]
                    * len(pdf),
                }
            )

    media = docs.mapInPandas(
        render,
        schema=(
            "media_id long, content binary, "
            "meta struct<mime:string,width:int,height:int,duration_ms:bigint>"
        ),
    )
    return _feature_mean_64(decode_features(media, dim=64))


def discretize_typical_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1: typical-period clustering of the hourly events series
    (iterative algorithm — rows-only)."""
    _prep(spark)
    from energy_pandas_spark.operators.clustering import discretize_frame

    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("ts"))
        .agg(F.avg("value").alias("v"))
    )
    out = discretize_frame(hourly, "ts", ["v"], noTypicalPeriods=3)
    return out.select("ts", F.round("v", 6).alias("v")).orderBy("ts")


# ---------------------------------------------------------------------------
# deterministic sampling / corpus statistics / cleaning pipeline
# ---------------------------------------------------------------------------


def hash_split_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/val/test split of the documents
    table (md5-bucket assignment — reruns and incremental loads agree
    on every row's split; the id_sum column proves exact membership,
    not just counts)."""
    _prep(spark)
    from energy_pandas_spark.operators.sampling import hash_split

    docs = _t(spark, sf_dir, "documents")
    return (
        hash_split(docs, "doc_id")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("doc_id").alias("id_sum"))
        .orderBy("split")
    )


_HASH_SPLIT_SQL = """
SELECT CASE WHEN b < 9800 THEN 'train' WHEN b < 9900 THEN 'val' ELSE 'test' END
         AS split,
       count(*) AS n_docs,
       sum(doc_id)::BIGINT AS id_sum
FROM (
  SELECT doc_id,
         (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10000)::INT AS b
  FROM documents
)
GROUP BY 1 ORDER BY 1
"""


def corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted deterministic mixture of three document sources (100% /
    50% / 10% keep rates by md5 bucket) — the map-only, shuffle-free
    corpus-composition primitive."""
    _prep(spark)
    from energy_pandas_spark.operators.sampling import weighted_mixture

    docs = _t(spark, sf_dir, "documents")
    srcnum = F.regexp_extract("source", r"(\d+)", 1).cast("int")
    a = docs.filter(srcnum < 7)
    b = docs.filter((srcnum >= 7) & (srcnum < 14))
    c = docs.filter(srcnum >= 14)
    mix = weighted_mixture([(a, 1.0), (b, 0.5), (c, 0.1)], key="doc_id")
    return (
        mix.groupBy("source_id")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("doc_id").alias("id_sum"))
        .orderBy("source_id")
    )


_CORPUS_MIXTURE_SQL = """
WITH b AS (
  SELECT doc_id,
         regexp_extract(source, '(\\d+)', 1)::INT AS srcnum,
         (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10000)::INT
           AS bucket
  FROM documents
), tagged AS (
  SELECT doc_id, 0 AS source_id FROM b WHERE srcnum < 7 AND bucket < 10000
  UNION ALL
  SELECT doc_id, 1 FROM b WHERE srcnum >= 7 AND srcnum < 14 AND bucket < 5000
  UNION ALL
  SELECT doc_id, 2 FROM b WHERE srcnum >= 14 AND bucket < 1000
)
SELECT source_id, count(*) AS n_docs, sum(doc_id)::BIGINT AS id_sum
FROM tagged GROUP BY 1 ORDER BY 1
"""


def stratified_sample_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-language keep rates (the
    rerun-stable sampleBy). id_sum proves exact membership."""
    _prep(spark)
    from energy_pandas_spark.operators.sampling import hash_sample_by

    docs = _t(spark, sf_dir, "documents")
    out = hash_sample_by(
        docs, "doc_id", "lang", {"en": 0.5, "de": 0.2}, default_rate=0.05
    )
    return (
        out.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("doc_id").alias("id_sum"))
        .orderBy("lang")
    )


_STRATIFIED_SQL = """
SELECT lang, count(*) AS n_docs, sum(doc_id)::BIGINT AS id_sum
FROM (
  SELECT lang, doc_id,
         (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10000)::INT
           AS b
  FROM documents
)
WHERE b < CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2000 ELSE 500 END
GROUP BY 1 ORDER BY 1
"""


def sample_per_source_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 7 deterministic inspection rows per source
    (operators/sampling.py:sample_k_per_group): per-group min-k by
    (md5 bucket, id) via the two-stage bounded rank — never a
    whole-group window partition."""
    _prep(spark)
    from energy_pandas_spark.operators.sampling import sample_k_per_group

    docs = _t(spark, sf_dir, "documents")
    return sample_k_per_group(docs, "source", 7).select(
        "source", "doc_id", "lang", "n_chars", "sample_rank"
    ).orderBy("source", "sample_rank")


_SAMPLE_PER_SOURCE_SQL = """
SELECT source, doc_id, lang, n_chars, sample_rank::INT AS sample_rank FROM (
  SELECT source, doc_id, lang, n_chars,
         row_number() OVER (
           PARTITION BY source
           ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                      % 1000000,
                    doc_id
         ) AS sample_rank
  FROM documents
)
WHERE sample_rank <= 7
ORDER BY source, sample_rank
"""


def quantile_gate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source bottom-decile gate (operators/sampling.py:
    drop_below_group_quantile): drop every document whose n_chars is
    strictly below its source's 10% quantile (integer-rational rank,
    percentile_disc semantics, boundary-inclusive keep), then report
    per-source survivor stats. The cumulative walk runs on the
    (source, score) count table, never a per-row window."""
    _prep(spark)
    from energy_pandas_spark.operators.sampling import drop_below_group_quantile

    docs = _t(spark, sf_dir, "documents")
    gated = drop_below_group_quantile(docs, "n_chars", "source", permille=100)
    return (
        gated.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("n_chars").alias("min_chars"),
            F.sum("n_chars").alias("chars_sum"),
        )
        .orderBy("source")
    )


_QUANTILE_GATE_SQL = """
WITH counts AS (
  SELECT source, n_chars, count(*) AS n FROM documents GROUP BY 1, 2
), tot AS (
  SELECT source, sum(n) AS n_rows FROM counts GROUP BY 1
), cum AS (
  SELECT source, n_chars,
         sum(n) OVER (PARTITION BY source ORDER BY n_chars
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
  FROM counts
), thr AS (
  SELECT c.source, min(c.n_chars) AS threshold
  FROM cum c JOIN tot t ON t.source = c.source
  WHERE c.c >= (t.n_rows * 100 + 999) // 1000
  GROUP BY 1
)
SELECT d.source, count(*)::BIGINT AS n_kept,
       min(d.n_chars)::BIGINT AS min_chars,
       sum(d.n_chars)::BIGINT AS chars_sum
FROM documents d JOIN thr ON thr.source = d.source
WHERE d.n_chars >= thr.threshold
GROUP BY 1 ORDER BY 1
"""


def length_weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-proportional deterministic sampling: keep probability =
    min(n_tokens, 200)/200 by md5 bucket — integer-exact decisions, so
    a token-budgeted subcorpus is unbiased in tokens, not docs. Pure
    map-side filter (operators/sampling.py:weighted_bernoulli_sample)."""
    _prep(spark)
    from energy_pandas_spark.operators.sampling import weighted_bernoulli_sample
    from energy_pandas_spark.operators.text import token_count

    docs = _t(spark, sf_dir, "documents").withColumn(
        "__w", token_count("text")
    )
    out = weighted_bernoulli_sample(docs, "doc_id", "__w", max_weight=200)
    return (
        out.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("doc_id").alias("id_sum"))
        .orderBy("lang")
    )


_LENGTH_WEIGHTED_SQL = """
WITH w AS (
  SELECT doc_id, lang,
         least(len(list_filter(string_split_regex(lower(text), '\\s+'),
                               x -> x != '')), 200) AS w,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10000 AS b
  FROM documents
)
SELECT lang, count(*) AS n_docs, sum(doc_id)::BIGINT AS id_sum
FROM w WHERE b * 200 < w * 10000
GROUP BY 1 ORDER BY 1
"""


def balanced_cap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture balancing: cap each language at ~300 docs by integer
    bucket threshold (cap*10000 div n) — a tiny count aggregate
    broadcast back onto a map-only filter; no per-group rank window, so
    a dominant source can't create a skewed task at scale."""
    _prep(spark)
    from energy_pandas_spark.operators.sampling import balanced_cap_sample

    docs = _t(spark, sf_dir, "documents")
    out = balanced_cap_sample(docs, "doc_id", "lang", cap=300)
    return (
        out.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("doc_id").alias("id_sum"))
        .orderBy("lang")
    )


_BALANCED_CAP_SQL = """
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
t AS (
  SELECT lang,
         CASE WHEN n <= 300 THEN 10000 ELSE (300::BIGINT * 10000) // n END
           AS thresh
  FROM c
)
SELECT d.lang, count(*) AS n_docs, sum(d.doc_id)::BIGINT AS id_sum
FROM documents d JOIN t USING (lang)
WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT % 10000 < thresh
GROUP BY 1 ORDER BY 1
"""


def vocab_coverage_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf coverage: fraction of all token occurrences covered by the
    top-100 vocabulary (operators/text.py:vocab_coverage) — integer
    counts, one rounded ratio."""
    _prep(spark)
    from energy_pandas_spark.operators.text import vocab_coverage

    docs = _t(spark, sf_dir, "documents")
    return vocab_coverage(docs, top=100).select(
        "vocab_size", "covered_tokens", "total_tokens", "coverage_micro"
    )


_VOCAB_COVERAGE_SQL = """
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x != '')) AS term
    FROM documents
  ) GROUP BY 1, 2
), terms AS (
  SELECT term, count(*) AS doc_freq, sum(tf)::BIGINT AS total_count
  FROM tf GROUP BY 1
), v AS (
  SELECT * FROM terms ORDER BY doc_freq DESC, term ASC LIMIT 100
), cov AS (
  SELECT count(*) AS vocab_size, sum(total_count)::BIGINT AS covered_tokens
  FROM v
), tot AS (
  SELECT coalesce(sum(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                      x -> x != ''))), 0)::BIGINT
           AS total_tokens
  FROM documents
)
SELECT vocab_size, covered_tokens, total_tokens,
       (covered_tokens * 1000000 // greatest(total_tokens, 1))::BIGINT
         AS coverage_micro
FROM cov, tot
"""


def boilerplate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc boilerplate fraction: share of token occurrences that are
    corpus-level high-document-frequency terms (>=78% of docs here —
    the synthetic vocabulary's DF mass sits at 0.75-0.80, so this
    threshold splits it mid-cluster and the fractions actually vary) —
    the C4-style chrome/navigation signal (operators/text.py:
    boilerplate_stats). One (doc,term) aggregate feeds both rollups;
    the boilerplate term set broadcasts."""
    _prep(spark)
    from energy_pandas_spark.operators.text import boilerplate_stats

    docs = _t(spark, sf_dir, "documents")
    return (
        boilerplate_stats(docs, df_ratio=0.78)
        .select(
            "doc_id", "n_tokens", "boilerplate_tokens", "boilerplate_micro"
        )
        .orderBy("doc_id")
    )


_BOILERPLATE_SQL = """
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x != '')) AS term
    FROM documents
  ) GROUP BY 1, 2
), nd AS (
  SELECT count(DISTINCT doc_id)::DOUBLE AS n_docs FROM documents
), boiler AS (
  SELECT term FROM tf, nd GROUP BY term, n_docs
  HAVING count(*) >= n_docs * 0.78
), per AS (
  SELECT tf.doc_id,
         sum(tf.tf)::BIGINT AS n_tokens,
         coalesce(sum(CASE WHEN b.term IS NOT NULL THEN tf.tf END), 0)::BIGINT
           AS boilerplate_tokens
  FROM tf LEFT JOIN boiler b ON tf.term = b.term
  GROUP BY 1
)
SELECT d.doc_id,
       coalesce(n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(boilerplate_tokens, 0)::BIGINT AS boilerplate_tokens,
       (coalesce(boilerplate_tokens, 0) * 1000000
        // greatest(coalesce(n_tokens, 0), 1))::BIGINT AS boilerplate_micro
FROM documents d LEFT JOIN per USING (doc_id)
ORDER BY doc_id
"""


def token_budget_select_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-documents-under-a-token-budget selection: quality = lexical
    diversity (distinct/total tokens), budget = 10k tokens — histogram
    boundary + deterministic hash-slice of the boundary bucket, no
    global sort (operators/sampling.py:select_token_budget)."""
    _prep(spark)
    from energy_pandas_spark.functions.textfns import tokens as _tokens
    from energy_pandas_spark.operators.sampling import select_token_budget

    docs = _t(spark, sf_dir, "documents")
    feats = docs.select(
        "doc_id",
        F.size(_tokens("text")).alias("n_tokens"),
        F.size(F.array_distinct(_tokens("text"))).alias("__d"),
    ).withColumn(
        "quality",
        F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(
            F.col("__d").cast("double") / F.col("n_tokens")
        ),
    )
    out = select_token_budget(
        feats, budget_tokens=10_000, quality_col="quality",
        token_col="n_tokens", key="doc_id",
    )
    return out.select(
        "doc_id", "qb", F.col("n_tokens").cast("long").alias("n_tokens")
    ).orderBy("doc_id")


_TOKEN_BUDGET_SQL = """
WITH d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')
           AS toks
  FROM documents
), f AS (
  SELECT doc_id, len(toks)::BIGINT AS n_tokens,
         CASE WHEN len(toks) = 0 THEN 0.0
              ELSE len(list_distinct(toks))::DOUBLE / len(toks) END AS q
  FROM d
), g AS (
  SELECT doc_id, n_tokens,
         least(greatest(cast(floor(q * 1000) AS INT), 0), 999) AS qb
  FROM f
), h AS (
  SELECT qb, sum(n_tokens)::BIGINT AS tok FROM g GROUP BY 1
), w AS (
  SELECT qb, tok,
         coalesce(sum(tok) OVER (ORDER BY qb DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS acc
  FROM h
), bnd AS (
  SELECT qb, tok, acc FROM w WHERE acc + tok > 10000
  ORDER BY qb DESC LIMIT 1
)
SELECT g.doc_id, g.qb, g.n_tokens
FROM g LEFT JOIN bnd ON true
WHERE bnd.qb IS NULL
   OR g.qb > bnd.qb
   OR (g.qb = bnd.qb AND
       ('0x' || substr(md5(g.doc_id::VARCHAR), 1, 15))::BIGINT % 10000
         < ((10000 - bnd.acc) * 10000 // bnd.tok))
ORDER BY g.doc_id
"""


def split_leakage_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination audit: exact-content dup pairs that
    straddle hash_split boundaries (60/20/20 here so small corpora
    exercise non-zero counts). One digest shuffle + one stats row,
    stacked to a row per split pair — no pair materialization
    (operators/sampling.py:split_leakage_stats)."""
    _prep(spark)
    from energy_pandas_spark.operators.sampling import split_leakage_stats

    docs = _t(spark, sf_dir, "documents")
    out = split_leakage_stats(
        docs, "doc_id", splits={"train": 0.6, "val": 0.2, "test": 0.2}
    )
    return out.orderBy("split_a", "split_b")


_SPLIT_LEAKAGE_SQL = """
WITH s AS (
  SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS digest,
         CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                   % 10000 < 6000 THEN 'train'
              WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT
                   % 10000 < 8000 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
), per AS (
  SELECT digest,
         count(*) FILTER (split = 'test')  AS n_test,
         count(*) FILTER (split = 'train') AS n_train,
         count(*) FILTER (split = 'val')   AS n_val
  FROM s GROUP BY 1
)
SELECT * FROM (
  SELECT 'test' AS split_a, 'train' AS split_b,
         count(*) FILTER (n_test > 0 AND n_train > 0)::BIGINT AS n_digests,
         coalesce(sum(n_test * n_train), 0)::BIGINT AS n_pairs FROM per
  UNION ALL
  SELECT 'test', 'val',
         count(*) FILTER (n_test > 0 AND n_val > 0)::BIGINT,
         coalesce(sum(n_test * n_val), 0)::BIGINT FROM per
  UNION ALL
  SELECT 'train', 'val',
         count(*) FILTER (n_train > 0 AND n_val > 0)::BIGINT,
         coalesce(sum(n_train * n_val), 0)::BIGINT FROM per
)
ORDER BY split_a, split_b
"""


def dedup_keep_best_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware exact dedup: the surviving copy per content group
    is the argmax by (token count, -doc_id) — keep the cleanest mirror,
    not the first seen. One digest shuffle via max_by struct ordering
    (operators/dedup.py:dedup_keep_best), integer quality so ties are
    engine-exact."""
    _prep(spark)
    from energy_pandas_spark.operators.dedup import dedup_keep_best
    from energy_pandas_spark.operators.text import token_count

    docs = _t(spark, sf_dir, "documents").withColumn(
        "quality", token_count("text")
    )
    return dedup_keep_best(docs, "quality").orderBy("digest")


_KEEP_BEST_SQL = """
WITH q AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS digest,
         len(list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x != '')) AS quality
  FROM documents
), r AS (
  SELECT digest, doc_id, quality,
         row_number() OVER (PARTITION BY digest
                            ORDER BY quality DESC, doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY digest) AS n_copies
  FROM q
)
SELECT digest, doc_id, quality, n_copies FROM r WHERE rn = 1 ORDER BY digest
"""


def vocab_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-100 terms by document frequency
    (integer-exact ordering)."""
    _prep(spark)
    from energy_pandas_spark.operators.text import vocabulary

    docs = _t(spark, sf_dir, "documents")
    return vocabulary(docs, top=100)


_VOCAB_SQL = """
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x != '')) AS term
    FROM documents
  ) GROUP BY 1, 2
)
SELECT term, count(*) AS doc_freq, sum(tf)::BIGINT AS total_count
FROM tf GROUP BY 1
ORDER BY doc_freq DESC, term ASC LIMIT 100
"""


def tfidf_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 terms by the integer-exact tf-idf ranking key
    (tf desc, doc_freq asc, term asc); the float score is emitted but
    never decides the ranking."""
    _prep(spark)
    from energy_pandas_spark.operators.text import tfidf_top_terms

    docs = _t(spark, sf_dir, "documents")
    out = tfidf_top_terms(docs, k=3)
    return out.select(
        "doc_id", "term", "tf", "doc_freq", F.round("tfidf", 6).alias("tfidf"),
        "rank",
    ).orderBy("doc_id", "rank")


_TFIDF_SQL = """
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x != '')) AS term
    FROM documents
  ) GROUP BY 1, 2
), dfreq AS (
  SELECT term, count(*) AS doc_freq FROM tf GROUP BY 1
), nd AS (
  SELECT count(DISTINCT doc_id) AS n FROM documents
), ranked AS (
  SELECT tf.doc_id, tf.term, tf.tf, d.doc_freq,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf DESC, d.doc_freq ASC, tf.term ASC)
           AS rank
  FROM tf JOIN dfreq d USING (term)
)
SELECT doc_id, term, tf, doc_freq,
       round(tf * ln((SELECT n FROM nd)::DOUBLE / doc_freq), 6) AS tfidf,
       rank
FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank
"""


def ngram_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide token bigram counts, top-100 (count desc, ngram asc)."""
    _prep(spark)
    from energy_pandas_spark.operators.text import ngram_counts

    docs = _t(spark, sf_dir, "documents")
    return ngram_counts(docs, n=2, top=100)


_NGRAM_SQL = """
WITH toks AS (
  SELECT list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')
           AS t
  FROM documents
), grams AS (
  SELECT t[i] || ' ' || t[i + 1] AS ngram
  FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i)
  WHERE len(t) >= 2
  UNION ALL
  -- engine edge: a doc with < n tokens yields ONE shingle = the whole
  -- joined text (may be '' for token-less docs)
  SELECT array_to_string(t, ' ') FROM toks WHERE len(t) < 2
)
SELECT ngram, count(*) AS n FROM grams GROUP BY 1
ORDER BY n DESC, ngram ASC LIMIT 100
"""


def redact_pii_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub (emails / IPv4 / phone numbers) over documents with
    deterministic synthetic PII appended (the corpus itself is clean, so
    the injection makes the replacement path — not just the no-op path —
    oracle-checked). Pure staged regexp_replace projection: no shuffle."""
    _prep(spark)
    from energy_pandas_spark.operators.text import redact_pii

    docs = _t(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com via 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".77 or +1 (415) 555-01"),
            F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        ).alias("text"),
    )
    return redact_pii(injected).select(
        "doc_id", "n_email", "n_ip", "n_phone", "redacted"
    ).orderBy("doc_id")


_REDACT_PII_SQL = r"""
WITH injected AS (
  SELECT doc_id,
         text || ' contact user' || doc_id::VARCHAR
              || '@example.com via 10.0.' || (doc_id % 256)::VARCHAR
              || '.77 or +1 (415) 555-01'
              || lpad((doc_id % 100)::VARCHAR, 2, '0') AS t
  FROM documents
), s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_email,
         regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t
  FROM injected
), s2 AS (
  SELECT doc_id, n_email,
         len(regexp_extract_all(t, '([0-9]{1,3}\.){3}[0-9]{1,3}'))::BIGINT AS n_ip,
         regexp_replace(t, '([0-9]{1,3}\.){3}[0-9]{1,3}', '<IP>', 'g') AS t
  FROM s1
), s3 AS (
  SELECT doc_id, n_email, n_ip,
         len(regexp_extract_all(t, '\+[0-9][0-9()\- ]{6,14}[0-9]'))::BIGINT AS n_phone,
         regexp_replace(t, '\+[0-9][0-9()\- ]{6,14}[0-9]', '<PHONE>', 'g') AS t
  FROM s2
)
SELECT doc_id, n_email, n_ip, n_phone, t AS redacted FROM s3 ORDER BY doc_id
"""


def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-decontamination check: md5-bucket 5% of documents is
    the held-out eval set; every remaining (training) doc reports what
    fraction of its distinct word 5-grams appears anywhere in that set.
    The eval side reduces to distinct grams before the probe join, so
    the join is broadcast-sized in practice and gram-keyed at worst."""
    _prep(spark)
    from energy_pandas_spark.operators.sampling import hash_bucket
    from energy_pandas_spark.operators.text import contamination_overlap

    docs = _t(spark, sf_dir, "documents").withColumn(
        "__b", hash_bucket("doc_id")
    )
    bench = docs.filter(F.col("__b") < 500)
    train = docs.filter(F.col("__b") >= 500)
    return (
        contamination_overlap(train, bench, n=5, threshold=0.5)
        # overlap_micro (integer `div`) instead of the rounded float:
        # n_hits/n_grams can be an exact decimal half where
        # cross-engine round(,6) tie-breaking diverges
        .select("doc_id", "n_grams", "n_hits", "overlap_micro", "contaminated")
        .orderBy("doc_id")
    )


def contamination_bloom_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Bloom-prefiltered twin of ``benchmark_contamination``: the
    corpus gram stream hashes JVM-side and drops against a broadcast
    bit table before the exact join (functions/bloom.py +
    operators/text.py:contamination_overlap_bloom). No false negatives
    + exact re-verify => same oracle as the exact version."""
    _prep(spark)
    from energy_pandas_spark.operators.sampling import hash_bucket
    from energy_pandas_spark.operators.text import contamination_overlap_bloom

    docs = _t(spark, sf_dir, "documents").withColumn(
        "__b", hash_bucket("doc_id")
    )
    bench = docs.filter(F.col("__b") < 500)
    train = docs.filter(F.col("__b") >= 500)
    return (
        contamination_overlap_bloom(train, bench, n=5, threshold=0.5)
        .select("doc_id", "n_grams", "n_hits", "overlap_micro", "contaminated")
        .orderBy("doc_id")
    )


_CONTAMINATION_SQL = r"""
WITH bucketed AS (
  SELECT doc_id, text,
         (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10000)::INT
           AS b
  FROM documents
), toks AS (
  SELECT doc_id, b,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')
           AS t
  FROM bucketed
), grams AS (
  SELECT doc_id, b, array_to_string(t[i:i+4], ' ') AS gram
  FROM toks, unnest(generate_series(1, len(t) - 4)) AS g(i)
  WHERE len(t) >= 5
  UNION ALL
  -- engine edge: a doc with < n tokens yields ONE shingle = the whole
  -- joined text (may be '' for token-less docs)
  SELECT doc_id, b, array_to_string(t, ' ') FROM toks WHERE len(t) < 5
), dgrams AS (
  SELECT DISTINCT doc_id, b, gram FROM grams
), bench AS (
  SELECT DISTINCT gram FROM dgrams WHERE b < 500
), probe AS (
  SELECT d.doc_id, d.gram, CASE WHEN bench.gram IS NULL THEN 0 ELSE 1 END AS hit
  FROM dgrams d LEFT JOIN bench ON d.gram = bench.gram
  WHERE d.b >= 500
)
SELECT doc_id,
       count(*) AS n_grams,
       sum(hit)::BIGINT AS n_hits,
       ((sum(hit)::BIGINT * 1000000) // count(*))::BIGINT AS overlap_micro,
       (sum(hit)::BIGINT * 1000000 >= 500000 * count(*)) AS contaminated
FROM probe GROUP BY 1 ORDER BY 1
"""


def q4_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-shaped order-priority count via EXISTS: orders in a
    quarter with at least one line item shipped more than 30 days after
    the order date (the testdata lineitem has no commit/receipt dates,
    so the lateness predicate adapts to shipdate-vs-orderdate). The
    EXISTS compiles to a left-semi join with a mixed equi + range
    condition — the semi side prunes to two columns before the shuffle."""
    _prep(spark)
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    window = orders.filter(
        (F.col("o_orderdate") >= F.lit("1995-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-10-01").cast("timestamp"))
    )
    late = window.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


_Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-07-01'
  AND o_orderdate < TIMESTAMP '1995-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY 1 ORDER BY 1
"""


def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filters: most-frequent-2-gram
    share and duplicated-5-gram share per document. One text scan, both
    gram sizes through a single tagged generator, two hash aggregates."""
    _prep(spark)
    from energy_pandas_spark.operators.text import repetition_stats

    return (
        repetition_stats(_t(spark, sf_dir, "documents"))
        .select(
            "doc_id", "top_gram_count", "n_top_grams", "dup_gram_count",
            "n_dup_grams", "top_gram_micro", "dup_gram_micro",
        )
        .orderBy("doc_id")
    )


_REPETITION_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS t
  FROM documents
), grams AS (
  SELECT doc_id, 'top' AS tag, array_to_string(t[i:i+1], ' ') AS gram
  FROM toks, unnest(generate_series(1, len(t) - 1)) AS g(i) WHERE len(t) >= 2
  UNION ALL
  SELECT doc_id, 'top', array_to_string(t, ' ') FROM toks WHERE len(t) < 2
  UNION ALL
  SELECT doc_id, 'dup', array_to_string(t[i:i+4], ' ')
  FROM toks, unnest(generate_series(1, len(t) - 4)) AS g(i) WHERE len(t) >= 5
  UNION ALL
  SELECT doc_id, 'dup', array_to_string(t, ' ') FROM toks WHERE len(t) < 5
), c AS (
  SELECT doc_id, tag, gram, count(*) AS cnt FROM grams GROUP BY 1, 2, 3
)
SELECT doc_id,
       max(CASE WHEN tag = 'top' THEN cnt END)::BIGINT AS top_gram_count,
       sum(CASE WHEN tag = 'top' THEN cnt END)::BIGINT AS n_top_grams,
       coalesce(sum(CASE WHEN tag = 'dup' AND cnt > 1 THEN cnt END), 0)::BIGINT
         AS dup_gram_count,
       sum(CASE WHEN tag = 'dup' THEN cnt END)::BIGINT AS n_dup_grams,
       (max(CASE WHEN tag = 'top' THEN cnt END)::BIGINT * 1000000
        // greatest(sum(CASE WHEN tag = 'top' THEN cnt END), 1))::BIGINT
         AS top_gram_micro,
       (coalesce(sum(CASE WHEN tag = 'dup' AND cnt > 1 THEN cnt END), 0)::BIGINT
          * 1000000
        // greatest(sum(CASE WHEN tag = 'dup' THEN cnt END), 1))::BIGINT
         AS dup_gram_micro
FROM c GROUP BY 1 ORDER BY 1
"""


def pack_sequences_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-chunk sequence packing: every document gets a
    (bucket, sequence, offset) slot in a corpus packed into 256-token
    training sequences across 8 md5 buckets. One shuffle (the bucket
    window); bit-reproducible on any engine."""
    _prep(spark)
    from energy_pandas_spark.operators.packing import pack_sequences
    from energy_pandas_spark.operators.text import token_count

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    out = pack_sequences(docs, "n_tokens", budget=256, n_buckets=8)
    return out.select(
        "doc_id", "pack_bucket", "n_tokens", "seq_id", "seq_offset", "n_seqs"
    ).orderBy("doc_id")


_PACK_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(text), '\s+'), x -> x != ''))::BIGINT
           AS n_tokens,
         (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 8)::INT
           AS pack_bucket
  FROM documents
), c AS (
  SELECT doc_id, pack_bucket, n_tokens,
         coalesce(sum(n_tokens) OVER (
           PARTITION BY pack_bucket ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS cum_excl
  FROM toks
)
SELECT doc_id, pack_bucket, n_tokens,
       (cum_excl // 256)::BIGINT AS seq_id,
       (cum_excl % 256)::BIGINT AS seq_offset,
       ((cum_excl + greatest(n_tokens, 1) - 1) // 256 - cum_excl // 256 + 1)::BIGINT
         AS n_seqs
FROM c ORDER BY doc_id
"""


def q13_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-shaped customer-order-count distribution: LEFT OUTER
    join customer->orders (urgent orders excluded on the right BEFORE
    the join), count per customer, then histogram the counts. Two
    shuffles: the outer equi-join and the tiny histogram agg."""
    _prep(spark)
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q13_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive-predicate revenue: lineitem x part
    equi-join with an OR-of-ANDs filter mixing columns of both sides
    (brand x size-band x quantity-band). The part side broadcasts; the
    per-arm quantity/size predicates stay pushable into the scans as
    their disjunction's bounding envelope."""
    _prep(spark)
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    arm1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(1, 11))
    )
    arm2 = (
        (F.col("p_brand") == "Brand#2")
        & (F.col("p_size").between(1, 25))
        & (F.col("l_quantity").between(10, 20))
    )
    arm3 = (
        (F.col("p_brand") == "Brand#3")
        & (F.col("p_size").between(1, 35))
        & (F.col("l_quantity").between(20, 30))
    )
    return j.filter(arm1 | arm2 | arm3).agg(
        F.round(F.sum(_rev()), 2).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


_Q19_SQL = """
SELECT round(sum(l_extendedprice::DECIMAL(12,2)
                 * (1 - l_discount)::DECIMAL(4,2)), 2)::DOUBLE AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


def melt_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): lineitem's four measure columns to long form
    (measure, value) per line — the wide->long reshape (pandas .melt /
    DataFrame.unpivot). Zero shuffle: Expand over the scan, then the
    tiny per-measure aggregate."""
    _prep(spark)
    li = _t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "value",
    )
    return (
        long.groupBy("measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(_m("value")), 2).cast("double").alias("total"),
            F.round(F.min("value"), 2).alias("vmin"),
            F.round(F.max("value"), 2).alias("vmax"),
        )
        .orderBy("measure")
    )


_MELT_SQL = """
SELECT measure, count(*) AS n,
       round(sum(value::DECIMAL(12,2)), 2)::DOUBLE AS total,
       round(min(value), 2) AS vmin, round(max(value), 2) AS vmax
FROM (
  SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
) GROUP BY measure ORDER BY measure
"""


def quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding column (the 4x
    storage/ANN compression): per-vector scale plus code-sum/L1/max
    integrity stats. Pure transform/aggregate expressions — zero
    shuffle, scan-bound."""
    _prep(spark)
    from energy_pandas_spark.functions.vectors import quantize_int8

    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.select("vec_id", quantize_int8("embedding").alias("qs"))
    codes = F.col("qs").getField("q")
    return qs.select(
        "vec_id",
        F.round(F.col("qs").getField("scale"), 6).alias("scale"),
        F.aggregate(
            codes, F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("q_sum"),
        F.aggregate(
            codes, F.lit(0).cast("long"), lambda a, x: a + F.abs(x)
        ).alias("q_l1"),
        F.array_max(F.transform(codes, lambda x: F.abs(x))).cast("int").alias(
            "q_max_abs"
        ),
    ).orderBy("vec_id")


_QUANTIZE_SQL = """
WITH m AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(x::DOUBLE))) AS max_abs
  FROM embeddings
), c AS (
  SELECT vec_id, max_abs / 127.0 AS scale,
         CASE WHEN max_abs = 0
              THEN list_transform(embedding, x -> 0)
              ELSE list_transform(
                     embedding,
                     x -> round(x::DOUBLE / (max_abs / 127.0))::INT)
         END AS codes
  FROM m
)
SELECT vec_id, round(scale, 6) AS scale,
       list_sum(codes)::BIGINT AS q_sum,
       list_sum(list_transform(codes, x -> abs(x)))::BIGINT AS q_l1,
       list_max(list_transform(codes, x -> abs(x)))::INT AS q_max_abs
FROM c ORDER BY vec_id
"""


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-shaped large-volume customers: orders whose total
    quantity exceeds 300, joined back to customer. The HAVING side
    reduces lineitem to (orderkey, sum) BEFORE any join — the
    group-filter-then-join shape — and the surviving key set is tiny,
    so AQE broadcasts it into orders."""
    _prep(spark)
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum(_m("l_quantity")), 2).cast("double").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"), "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


_Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       round(o_totalprice, 2) AS o_totalprice, sum_qty
FROM orders
JOIN (
  SELECT l_orderkey,
         round(sum(l_quantity::DECIMAL(12,2)), 2)::DOUBLE AS sum_qty
  FROM lineitem GROUP BY 1
  HAVING round(sum(l_quantity::DECIMAL(12,2)), 2)::DOUBLE > 300
) big ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""


def degree_days_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heating/cooling degree days (daily-mean method, base 18) over the
    events series as a temperature signal — one partial+final
    aggregation on the calendar day."""
    _prep(spark)
    from energy_pandas_spark.operators.analytics import degree_days

    ev = _t(spark, sf_dir, "events")
    out = degree_days(ev, "ts", "value", base=18.0, exact_micro=True)
    return out.select(
        "day", "t_avg_micro", "hdd_micro", "cdd_micro"
    ).orderBy("day")


_DEGREE_DAYS_SQL = """
SELECT ts::DATE AS day,
       ((sum(value::DECIMAL(12,2)) * 100)::BIGINT * 10000
          // count(value))::BIGINT AS t_avg_micro,
       greatest(0, (1800 * count(value)
                      - (sum(value::DECIMAL(12,2)) * 100)::BIGINT) * 10000
                   // count(value))::BIGINT AS hdd_micro,
       greatest(0, ((sum(value::DECIMAL(12,2)) * 100)::BIGINT
                      - 1800 * count(value)) * 10000
                   // count(value))::BIGINT AS cdd_micro
FROM events GROUP BY 1 ORDER BY 1
"""


def ewma_final_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user (pandas
    ewm(adjust=False) semantics through an Arrow-batched per-key
    kernel); the oracle folds the identical recursion with DuckDB
    list_reduce, so the WHOLE per-key recursion is differentially
    checked, not just row counts."""
    _prep(spark)
    from energy_pandas_spark.operators.windows import ewma

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    out = ewma(ev, "ts", "value", alpha=0.3, by="user_id", tiebreak="event_id")
    return (
        out.groupBy("user_id")
        .agg(
            F.round(
                F.max_by("ewma", F.struct(F.col("ts"), F.col("event_id"))), 6
            ).alias("ewma_final"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("user_id")
    )


_EWMA_SQL = """
SELECT user_id,
       round(list_reduce(list(value ORDER BY ts, event_id),
                         (acc, x) -> acc * 0.7 + x * 0.3), 6) AS ewma_final,
       count(*) AS n
FROM events GROUP BY 1 ORDER BY 1
"""


def twa_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (step/meter-data
    convention: each sample weighted by its hold duration). One keyed
    lead window + one aggregation, single shuffle."""
    _prep(spark)
    from energy_pandas_spark.operators.analytics import time_weighted_avg

    ev = _t(spark, sf_dir, "events")
    out = time_weighted_avg(
        ev, "ts", "value", by="user_id", tiebreak="event_id"
    )
    return out.select(
        "user_id",
        F.round("twa", 6).alias("twa"),
        F.round("span_seconds", 3).alias("span_seconds"),
        "n_samples",
    ).orderBy("user_id")


_TWA_SQL = """
WITH d AS (
  SELECT user_id, value,
         epoch(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               - ts) AS dur
  FROM events
)
SELECT user_id,
       round(sum(value * dur) / sum(dur), 6) AS twa,
       round(sum(dur), 3) AS span_seconds,
       count(*) AS n_samples
FROM d GROUP BY 1 ORDER BY 1
"""


def url_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-density quality filter + domain extraction over documents
    with deterministic synthetic links appended (the corpus itself has
    none, so injection makes the extraction path oracle-checked). One
    codegen'd regex projection, zero shuffle."""
    _prep(spark)
    from energy_pandas_spark.operators.text import url_stats

    docs = _t(spark, sf_dir, "documents")
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" see https://site"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com/page/"),
            F.col("doc_id").cast("string"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" and http://mirror.example.org/x"),
                    (F.col("doc_id") % 11).cast("string"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return (
        url_stats(injected)
        .select(
            "doc_id",
            "n_urls",
            "n_domains",
            "link_density_micro",
            F.array_join("domains", ",").alias("domains"),
        )
        .orderBy("doc_id")
    )


_URL_STATS_SQL = r"""
WITH injected AS (
  SELECT doc_id,
         text || ' see https://site' || (doc_id % 7)::VARCHAR
              || '.example.com/page/' || doc_id::VARCHAR
              || CASE WHEN doc_id % 3 = 0
                      THEN ' and http://mirror.example.org/x'
                           || (doc_id % 11)::VARCHAR
                      ELSE '' END AS t
  FROM documents
), ex AS (
  SELECT doc_id, t,
         regexp_extract_all(t, 'https?://[A-Za-z0-9._~:/?#@!$&*+,;=%\-]+')
           AS urls,
         list_sort(list_distinct(
           regexp_extract_all(t, 'https?://([A-Za-z0-9.\-]+)', 1))) AS doms
  FROM injected
)
SELECT doc_id,
       len(urls)::BIGINT AS n_urls,
       len(doms)::BIGINT AS n_domains,
       (coalesce(list_sum(list_transform(urls, x -> len(x))), 0)::BIGINT
          * 1000000 // greatest(len(t), 1))::BIGINT AS link_density_micro,
       array_to_string(doms, ',') AS domains
FROM ex ORDER BY doc_id
"""


def _with_synth_urls(docs):
    """Deterministic synthetic URL per document (the corpus has no URL
    column): six variants exercising every canonicalization rule —
    mixed-case scheme/host + www + default port + tracking params,
    fragments, trailing slashes, userinfo, non-URL garbage, and a
    multi-part public suffix. Variants 0/1/2 collapse across documents
    sharing (source, doc_id%20), so the dedup path genuinely drops
    rows."""
    did, src = F.col("doc_id"), F.col("source")
    pg = (did % 20).cast("string")
    v = did % 6
    url = (
        F.when(
            v == 0,
            F.concat(
                F.lit("HTTPS://WWW."), src, F.lit(".Example.COM:443/page/"),
                pg, F.lit("/?utm_source=feed&b=2&a=1"),
            ),
        )
        .when(
            v == 1,
            F.concat(
                F.lit("https://"), src, F.lit(".example.com/page/"), pg,
                F.lit("#frag"),
            ),
        )
        .when(
            v == 2,
            F.concat(
                F.lit("http://"), src, F.lit(".example.com:80/page/"), pg,
                F.lit("///"),
            ),
        )
        .when(
            v == 3,
            F.concat(
                F.lit("https://user@"), src, F.lit(".example.com/page/"),
                pg, F.lit("?z=9&gclid=abc&a=1"),
            ),
        )
        .when(v == 4, F.concat(F.lit("not a url "), did.cast("string")))
        .otherwise(
            F.concat(
                F.lit("https://cdn."), src, F.lit(".example.co.uk/asset/"),
                (did % 7).cast("string"),
            )
        )
    )
    return docs.select("doc_id", url.alias("url"), "text")


_SYNTH_URL_CTE = r"""
  SELECT doc_id,
         CASE doc_id % 6
           WHEN 0 THEN 'HTTPS://WWW.' || source || '.Example.COM:443/page/'
                       || (doc_id % 20)::VARCHAR || '/?utm_source=feed&b=2&a=1'
           WHEN 1 THEN 'https://' || source || '.example.com/page/'
                       || (doc_id % 20)::VARCHAR || '#frag'
           WHEN 2 THEN 'http://' || source || '.example.com:80/page/'
                       || (doc_id % 20)::VARCHAR || '///'
           WHEN 3 THEN 'https://user@' || source || '.example.com/page/'
                       || (doc_id % 20)::VARCHAR || '?z=9&gclid=abc&a=1'
           WHEN 4 THEN 'not a url ' || doc_id::VARCHAR
           ELSE 'https://cdn.' || source || '.example.co.uk/asset/'
                || (doc_id % 7)::VARCHAR
         END AS url,
         text
  FROM documents
"""

# the DuckDB twin of operators/urls.py:canonical_url — the LITERAL
# same Java∩RE2 regexes and rule order
_CANON_URL_CTE = r"""
  SELECT *,
    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS scheme,
    regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1) AS auth
  FROM u
), h AS (
  SELECT *,
    regexp_replace(
      lower(regexp_extract(auth, '^(?:[^@]*@)?([^:]*)', 1)),
      '^www\.', '') AS host,
    regexp_extract(auth, ':([0-9]+)$', 1) AS port,
    regexp_replace(
      regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1),
      '/+$', '') AS path0,
    coalesce(array_to_string(list_sort(list_filter(
      string_split(regexp_extract(url, '^[^#]*\?([^#]*)', 1), '&'),
      x -> x != '' AND NOT regexp_matches(x,
        '^(utm_[a-z]+|gclid|fbclid|msclkid|yclid|igshid|mc_cid|mc_eid|ref|ref_src|spm|_ga|_gl)=')
    )), '&'), '') AS q
  FROM sa
), c AS (
  SELECT *,
    CASE WHEN scheme = '' OR host = '' THEN NULL
         ELSE scheme || '://' || host
              || (CASE WHEN port = ''
                        OR (scheme = 'http' AND port = '80')
                        OR (scheme = 'https' AND port = '443')
                       THEN '' ELSE ':' || port END)
              || (CASE WHEN path0 = '' THEN '/' ELSE path0 END)
              || (CASE WHEN q = '' THEN '' ELSE '?' || q END)
    END AS canonical_url,
    CASE WHEN host = '' OR host IS NULL THEN NULL ELSE
      (CASE WHEN len(string_split(host, '.')) <= 1 THEN host
            WHEN len(string_split(host, '.')) >= 3
                 AND (string_split(host, '.')[-2] || '.'
                      || string_split(host, '.')[-1])
                     IN ('co.uk','org.uk','ac.uk','gov.uk','me.uk','net.uk',
                         'com.au','net.au','org.au','edu.au','gov.au',
                         'co.jp','ne.jp','or.jp','ac.jp','go.jp',
                         'co.kr','or.kr','go.kr',
                         'com.br','net.br','org.br',
                         'com.cn','net.cn','org.cn','gov.cn',
                         'com.mx','com.ar','com.tr','com.sg','com.hk','com.tw',
                         'co.in','co.za','co.nz','co.id','co.th')
            THEN string_split(host, '.')[-3] || '.'
                 || string_split(host, '.')[-2] || '.'
                 || string_split(host, '.')[-1]
            ELSE string_split(host, '.')[-2] || '.'
                 || string_split(host, '.')[-1] END)
    END AS domain
  FROM h
"""


def url_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + registrable-domain extraction
    (operators/urls.py:canonical_url/url_domain) over documents with
    deterministic synthetic URLs: lowercase scheme/host, www/userinfo/
    default-port strip, fragment drop, tracking-param drop + sort,
    trailing-slash normalization, multi-part public-suffix domains.
    Map-only codegen projection; the oracle evaluates the literal same
    Java∩RE2 regexes."""
    _prep(spark)
    from energy_pandas_spark.operators.urls import canonical_url, url_domain

    docs = _t(spark, sf_dir, "documents")
    return (
        _with_synth_urls(docs)
        .select(
            "doc_id",
            "url",
            canonical_url("url").alias("canonical_url"),
            url_domain("url").alias("domain"),
        )
        .orderBy("doc_id")
    )


_URL_CANONICAL_SQL = rf"""
WITH u AS ({_SYNTH_URL_CTE}
), sa AS ({_CANON_URL_CTE}
)
SELECT doc_id, url, canonical_url, domain FROM c ORDER BY doc_id
"""


def url_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup (operators/urls.py:url_dedup): one survivor
    (smallest doc_id) per canonical URL, n_copies counted; rows whose
    URL does not canonicalize are all kept. One digest-keyed shuffle
    over (canonical, id) — text never moves."""
    _prep(spark)
    from energy_pandas_spark.operators.urls import url_dedup

    docs = _t(spark, sf_dir, "documents")
    return url_dedup(_with_synth_urls(docs)).orderBy("doc_id")


_URL_DEDUP_SQL = rf"""
WITH u AS ({_SYNTH_URL_CTE}
), sa AS ({_CANON_URL_CTE}
)
SELECT canonical_url, min(doc_id) AS doc_id, count(*)::BIGINT AS n_copies
FROM c WHERE canonical_url IS NOT NULL GROUP BY canonical_url
UNION ALL
SELECT canonical_url, doc_id, 1::BIGINT AS n_copies
FROM c WHERE canonical_url IS NULL
ORDER BY doc_id
"""


def domain_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registrable-domain corpus card (operators/urls.py:
    domain_stats): doc/char totals and integer share permille — the
    table crawl-site caps are enforced from. One map-combined
    aggregate + a broadcast 1-row total."""
    _prep(spark)
    from energy_pandas_spark.operators.urls import domain_stats

    docs = _t(spark, sf_dir, "documents")
    return domain_stats(_with_synth_urls(docs)).orderBy("domain")


_DOMAIN_STATS_SQL = rf"""
WITH u AS ({_SYNTH_URL_CTE}
), sa AS ({_CANON_URL_CTE}
), per AS (
  SELECT coalesce(domain, '(none)') AS domain,
         count(*)::BIGINT AS n_docs,
         sum(len(coalesce(text, '')))::BIGINT AS n_chars
  FROM c GROUP BY 1
)
SELECT domain, n_docs, n_chars,
       ((1000 * n_docs) // (SELECT sum(n_docs) FROM per))::BIGINT
         AS docs_permille
FROM per ORDER BY domain
"""


def domain_cap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The URL layer composed with mixture balancing: registrable
    domain (operators/urls.py:url_domain) feeds balanced_cap_sample —
    cap any one crawl site at ~100 docs via the integer bucket
    threshold (count aggregate broadcast onto a map-only filter; no
    per-group rank window, so a mega-domain cannot create a skewed
    task). Unparseable URLs group under '(none)' and are capped like
    any other site."""
    _prep(spark)
    from energy_pandas_spark.operators.sampling import balanced_cap_sample
    from energy_pandas_spark.operators.urls import url_domain

    docs = _with_synth_urls(_t(spark, sf_dir, "documents"))
    dom = docs.withColumn(
        "domain", F.coalesce(url_domain(F.col("url")), F.lit("(none)"))
    )
    out = balanced_cap_sample(dom, "doc_id", "domain", cap=100)
    return (
        out.groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
        )
        .orderBy("domain")
    )


_DOMAIN_CAP_SQL = rf"""
WITH u AS ({_SYNTH_URL_CTE}
), sa AS ({_CANON_URL_CTE}
), dd AS (
  SELECT doc_id, coalesce(domain, '(none)') AS domain FROM c
), cnt AS (SELECT domain, count(*) AS n FROM dd GROUP BY 1),
t AS (
  SELECT domain,
         CASE WHEN n <= 100 THEN 10000 ELSE (100::BIGINT * 10000) // n END
           AS thresh
  FROM cnt
)
SELECT d.domain, count(*) AS n_docs, sum(d.doc_id)::BIGINT AS id_sum
FROM dd d JOIN t USING (domain)
WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 15))::BIGINT % 10000 < thresh
GROUP BY 1 ORDER BY 1
"""


_BLOCKLIST_TERMS = ["dup", "slow", "the"]


def blocklist_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style blocklist exposure (operators/text.py:blocklist_stats):
    occurrence and distinct-term counts plus the blocked-token
    fraction, against a small in-plan term list — one map-only codegen
    projection, zero shuffle."""
    _prep(spark)
    from energy_pandas_spark.operators.text import blocklist_stats

    docs = _t(spark, sf_dir, "documents")
    return blocklist_stats(docs, _BLOCKLIST_TERMS).select(
        "doc_id", "n_blocklist_hits", "n_blocklist_terms", "blocklist_micro"
    ).orderBy("doc_id")


_BLOCKLIST_SQL = r"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     x -> x != '') AS toks
  FROM documents
)
SELECT doc_id,
       len(list_filter(toks, t -> list_contains(['dup', 'slow', 'the'], t)))
         ::BIGINT AS n_blocklist_hits,
       len(list_intersect(list_distinct(toks), ['dup', 'slow', 'the']))
         ::BIGINT AS n_blocklist_terms,
       (len(list_filter(toks, t -> list_contains(['dup', 'slow', 'the'], t)))
          ::BIGINT * 1000000 // greatest(len(toks), 1))::BIGINT
         AS blocklist_micro
FROM tok ORDER BY doc_id
"""


def html_extract_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML -> text extraction (operators/text.py:html_to_text) over
    documents wrapped in deterministic synthetic markup (script/style
    heads, headings, paragraph + entity footers — the corpus itself is
    plain text, so injection makes the strip path oracle-checked).
    One chain of codegen regex/literal replacements, zero shuffle."""
    _prep(spark)
    from energy_pandas_spark.operators.text import html_to_text

    docs = _t(spark, sf_dir, "documents")
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><title>Doc "),
            F.col("doc_id").cast("string"),
            F.lit("</title><script>var x = '<p>';</script><style>p{color:red}</style>"),
            F.lit("</head><body><!-- hidden --><h1>Doc "),
            F.col("doc_id").cast("string"),
            F.lit("</h1><p>"),
            F.coalesce(F.col("text"), F.lit("")),
            F.lit("</p><div>tail &amp;amp; &lt;end&gt;</div></body></html>"),
        ).alias("text"),
    )
    return (
        html_to_text(wrapped)
        .select("doc_id", "text", F.length("text").cast("long").alias("n_chars"))
        .orderBy("doc_id")
    )


_HTML_EXTRACT_SQL = r"""
WITH wrapped AS (
  SELECT doc_id,
         '<html><head><title>Doc ' || doc_id::VARCHAR
         || '</title><script>var x = ''<p>'';</script><style>p{color:red}</style>'
         || '</head><body><!-- hidden --><h1>Doc ' || doc_id::VARCHAR
         || '</h1><p>' || coalesce(text, '')
         || '</p><div>tail &amp;amp; &lt;end&gt;</div></body></html>' AS h
  FROM documents
), stripped AS (
  SELECT doc_id, trim(
    regexp_replace(
    regexp_replace(
      replace(replace(replace(replace(replace(replace(
        regexp_replace(
        regexp_replace(
        regexp_replace(
        regexp_replace(
        regexp_replace(h,
          '(?is)<script\b.*?</script\s*>', ' ', 'g'),
          '(?is)<style\b.*?</style\s*>', ' ', 'g'),
          '(?s)<!--.*?-->', ' ', 'g'),
          '(?i)</?(p|div|br|li|ul|ol|tr|td|th|table|h[1-6]|blockquote|section|article|header|footer)\b[^>]*>',
          chr(10), 'g'),
          '(?s)<[^>]*>', ' ', 'g'),
        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
        '&nbsp;', ' '), '&amp;', '&'),
      '[ \t\r]+', ' ', 'g'),
      ' ?\n[ \n]*', chr(10), 'g')
  ) AS text
  FROM wrapped
)
SELECT doc_id, text, length(text)::BIGINT AS n_chars
FROM stripped ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# TPC-H breadth pack 2: multi-join volume/share/profit, top-k join aggs,
# correlated-average, exists/not-exists, scalar-subquery anti-join.
# (No partsupp table in the testdata, so Q2/Q9/Q11/Q16/Q20 cost columns
# are adapted: Q9 uses p_retailprice as the supply-cost proxy; Q21/Q22
# use shipdate lateness / nationkey country codes for the missing
# commitdate/receiptdate/phone columns. Shapes are unchanged.)
# ---------------------------------------------------------------------------

def _rev():
    """Exact revenue factor: (12,2) x (4,2) -> DECIMAL(17,4), order-free
    under sum (see the decimal-money note above q1)."""
    return _m("l_extendedprice") * (1 - F.col("l_discount")).cast(_DRATE)


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped volume shipping between two nations: lineitem x
    orders x supplier x customer with both ends resolved to nation
    names and the (supp, cust) pair restricted to the two directions.
    The nation dims broadcast; supplier/customer joins stay key-equi
    shuffles that AQE can demote to broadcasts at small SF. The
    shipdate range predicate is pushed into the parquet scan."""
    _prep(spark)
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("__snk"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("__cnk"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"),
            F.lit("1997-12-31").cast("timestamp"),
        )
    ).select("l_orderkey", "l_suppkey", "l_shipdate", _rev().alias("__vol"))
    j = (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("__snk"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("__cnk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
        )
        .agg(F.round(F.sum("__vol"), 2).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_Q7_SQL = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       round(sum(l_extendedprice::DECIMAL(12,2)
                 * (1 - l_discount)::DECIMAL(4,2)), 2)::DOUBLE AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-shaped market share: for PROMO parts sold to ASIA-region
    customers, NATION_2 suppliers' share of yearly volume. Five joins;
    nation/region dims broadcast, part filtered before its join (at
    scale the part side is a key-equi shuffle — 1/6 selectivity is not
    broadcastable), conditional aggregate for the share."""
    _prep(spark)
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", _rev().alias("__vol")
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between(
            F.lit("1995-01-01").cast("timestamp"),
            F.lit("1996-12-31").cast("timestamp"),
        )
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").cast("long").alias("o_year"))
    asia_nations = (
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("__cnk"))
    )
    cust = _t(spark, sf_dir, "customer").join(
        F.broadcast(asia_nations), F.col("c_nationkey") == F.col("__cnk")
    ).select("c_custkey")
    supp_nation = _t(spark, sf_dir, "supplier").join(
        F.broadcast(
            _t(spark, sf_dir, "nation").select(
                F.col("n_nationkey").alias("__snk"), F.col("n_name")
            )
        ),
        F.col("s_nationkey") == F.col("__snk"),
    ).select("s_suppkey", "n_name")
    j = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        j.groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("n_name") == "NATION_2", F.col("__vol"))
                ).cast("double")
                / F.sum("__vol").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


_Q8_SQL = """
SELECT year(o_orderdate) AS o_year,
       round(sum(CASE WHEN n2.n_name = 'NATION_2'
                      THEN l_extendedprice::DECIMAL(12,2)
                           * (1 - l_discount)::DECIMAL(4,2) END)::DOUBLE
             / sum(l_extendedprice::DECIMAL(12,2)
                   * (1 - l_discount)::DECIMAL(4,2))::DOUBLE, 6) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'PROMO' AND r_name = 'ASIA'
  AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
GROUP BY 1 ORDER BY 1
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-shaped product-type profit by nation and year. The
    testdata has no partsupp, so supply cost is proxied as
    0.6 * p_retailprice (fixed margin), keeping the four-way join +
    name-pattern filter + (nation, year) rollup shape. Profit =
    revenue - cost*qty; parts filtered on the LIKE before the join."""
    _prep(spark)
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("widget")).select(
        "p_partkey", "p_retailprice"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity", _rev().alias("__rev")
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("long").alias("o_year")
    )
    supp_nation = _t(spark, sf_dir, "supplier").join(
        F.broadcast(
            _t(spark, sf_dir, "nation").select(
                F.col("n_nationkey").alias("__snk"), F.col("n_name").alias("nation")
            )
        ),
        F.col("s_nationkey") == F.col("__snk"),
    ).select("s_suppkey", "nation")
    j = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp_nation, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    amount = F.col("__rev") - F.lit("0.6").cast("decimal(2,1)") * _m(
        "p_retailprice"
    ) * _m("l_quantity")
    return (
        j.groupBy("nation", "o_year")
        .agg(F.round(F.sum(amount), 2).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


_Q9_SQL = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       round(sum(l_extendedprice::DECIMAL(12,2)
                 * (1 - l_discount)::DECIMAL(4,2)
                 - 0.6 * p_retailprice::DECIMAL(12,2)
                       * l_quantity::DECIMAL(12,2)), 2)::DOUBLE AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2 ORDER BY 1, 2 DESC
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped returned-item report: revenue lost to returns
    per customer in one quarter, top 20. The lineitem/orders join
    carries only the quarter's orders (filter before join); the
    customer attach happens AFTER the per-customer aggregate so the
    big join ships one row per customer, not per line."""
    _prep(spark)
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", _rev().alias("__rev")
    )
    per_cust = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("__rev").alias("__tp"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("__cnk"), "n_name"
    )
    return (
        per_cust.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("__cnk"))
        .orderBy(F.desc("__tp"), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.round("__tp", 2).cast("double").alias("revenue"),
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
    )


_Q10_SQL = """
SELECT c_custkey, c_name, round(rev, 2)::DOUBLE AS revenue,
       round(c_acctbal, 2) AS c_acctbal, n_name
FROM (
  SELECT o_custkey, sum(l_extendedprice::DECIMAL(12,2)
                        * (1 - l_discount)::DECIMAL(4,2)) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
)
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY rev DESC, c_custkey
LIMIT 20
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-shaped promotion effect: PROMO-type share of one
    month's revenue. Single lineitem x part key join + conditional
    aggregate; the month predicate prunes the lineitem scan."""
    _prep(spark)
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("l_partkey", _rev().alias("__rev"))
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    return j.agg(
        F.round(
            100.0
            * F.sum(
                F.when(F.col("p_type") == "PROMO", F.col("__rev"))
            ).cast("double")
            / F.sum("__rev").cast("double"),
            6,
        ).alias("promo_revenue")
    )


_Q14_SQL = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice::DECIMAL(12,2)
                                   * (1 - l_discount)::DECIMAL(4,2)
                         END)::DOUBLE
             / sum(l_extendedprice::DECIMAL(12,2)
                   * (1 - l_discount)::DECIMAL(4,2))::DOUBLE, 6) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-shaped top supplier: quarterly revenue per supplier,
    keep the max-revenue supplier(s). The 'view' is a per-supplier
    aggregate; the max attaches as a broadcast 1-row join (no window
    over an unpartitioned frame). The per-supplier aggregate is
    persisted because BOTH the max branch and the join branch consume
    it and Spark's ReuseExchange does not catch the shared subtree —
    without it the lineitem scan+agg runs twice (plan-locked in
    tests). Revenue is rounded BEFORE the max comparison so the
    equality cannot split on last-ulp summation-order differences
    between engines."""
    _prep(spark)
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    ).select("l_suppkey", _rev().alias("__rev"))
    revenue = track_cache(li.groupBy("l_suppkey").agg(
        F.round(F.sum("__rev"), 2).cast("double").alias("total_revenue")
    ).persist())
    top = revenue.agg(F.max("total_revenue").alias("__mx"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(top), F.col("total_revenue") == F.col("__mx"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey, round(sum(l_extendedprice::DECIMAL(12,2)
                              * (1 - l_discount)::DECIMAL(4,2)), 2)::DOUBLE
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-shaped small-quantity-order revenue: average yearly
    revenue lost if Brand#5 orders below 20%% of the part's mean
    quantity were not taken. The correlated per-part AVG decorrelates
    into a window aggregate over the brand-filtered join — ONE
    lineitem scan and ONE shuffle (partition by part key on the
    ~1/25-brand subset), instead of the naive two-scan
    aggregate-then-rejoin plan."""
    _prep(spark)
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5").select(
        "p_partkey"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    thresh = 0.2 * F.avg("l_quantity").over(Window.partitionBy("p_partkey"))
    return (
        j.withColumn("__thresh", thresh)
        .filter(F.col("l_quantity") < F.col("__thresh"))
        .agg(
            F.round(
                F.sum(_m("l_extendedprice")).cast("double") / 7.0, 2
            ).alias("avg_yearly")
        )
    )


_Q17_SQL = """
SELECT round(sum(l_extendedprice::DECIMAL(12,2))::DOUBLE / 7.0, 2) AS avg_yearly
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#5'
  AND l_quantity < (
    SELECT 0.2 * avg(l_quantity) FROM lineitem WHERE l_partkey = p_partkey
  )
"""


def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-shaped suppliers-who-kept-orders-waiting: finished
    orders where exactly one supplier shipped late (> 60 days after
    the order date, standing in for the missing commit/receipt dates)
    while other suppliers participated. The EXISTS / NOT-EXISTS pair
    decorrelates into ONE per-order aggregate (distinct suppliers,
    distinct late suppliers, late line count) — one join + one agg
    instead of three correlated lineitem scans. The DuckDB oracle runs
    the classic correlated form, so the rewrite is differentially
    proven equivalent."""
    _prep(spark)
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("__n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("__n_late_supp"),
            F.max(F.when(late, F.col("l_suppkey"))).alias("__late_supp"),
            F.sum(F.when(late, 1).otherwise(0)).alias("__n_late_lines"),
        )
        .filter((F.col("__n_supp") > 1) & (F.col("__n_late_supp") == 1))
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.groupBy("__late_supp")
        .agg(F.sum("__n_late_lines").alias("numwait"))
        .join(supp, F.col("__late_supp") == F.col("s_suppkey"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
        .select("s_name", "numwait")
    )


_Q21_SQL = """
SELECT s_name, count(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY s_name ORDER BY numwait DESC, s_name
LIMIT 10
"""


def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-shaped global sales opportunity: well-funded customers
    (balance above the positive-balance average of their country group)
    with no recent orders (the synthetic data gives every customer at
    least one order ever, so "lapsed since mid-2000" stands in for
    "never ordered"), counted per country code (nationkey stands in
    for the missing phone prefix). Scalar subquery broadcasts as a
    1-row join; the no-recent-orders test is a LEFT ANTI join shipping
    only o_custkey of the date-pruned orders scan."""
    _prep(spark)
    codes = [0, 1, 2, 3, 4]
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(codes)
    ).select("c_custkey", "c_nationkey", "c_acctbal")
    avg_pos = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_m("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("__avg")
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp")
    ).select("o_custkey")
    return (
        cust.join(F.broadcast(avg_pos))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(_m("c_acctbal")), 2).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


_Q22_SQL = """
SELECT c_nationkey AS cntrycode, count(*) AS numcust,
       round(sum(c_acctbal::DECIMAL(12,2)), 2)::DOUBLE AS totacctbal
FROM customer
WHERE c_nationkey IN (0, 1, 2, 3, 4)
  AND c_acctbal > (
    SELECT sum(c_acctbal::DECIMAL(12,2))::DOUBLE / count(*) FROM customer
    WHERE c_acctbal > 0.0 AND c_nationkey IN (0, 1, 2, 3, 4)
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-06-01'
  )
GROUP BY 1 ORDER BY 1
"""


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-shaped minimum-cost supplier (no partsupp table in the
    testdata, so the supply relation derives from lineitem): for PROMO
    parts of size <= 10, among EUROPE suppliers that shipped the part,
    keep the one(s) with the minimum cost. Cost is MIN(l_extendedprice)
    per (part, supplier) — an order-independent exact aggregate, so the
    min-equality join cannot flip on summation order between engines.
    The correlated min subquery decorrelates into a per-part aggregate
    + equality join; supplier/nation/region dims broadcast."""
    _prep(spark)
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "PROMO") & (F.col("p_size") <= 10)
    ).select("p_partkey", "p_brand", "p_size")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select(
        "r_regionkey"
    )
    euro_supp = supp.join(
        F.broadcast(nat.join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    supply = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(euro_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_brand", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min("l_extendedprice").alias("supply_cost"))
    )
    min_cost = supply.groupBy(F.col("p_partkey").alias("__pk")).agg(
        F.min("supply_cost").alias("__min_cost")
    )
    return (
        supply.join(
            min_cost,
            (F.col("p_partkey") == F.col("__pk"))
            & (F.col("supply_cost") == F.col("__min_cost")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand", "supply_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


_Q2_SQL = """
WITH supply AS (
  SELECT p_partkey, p_brand, s_suppkey, s_name, s_acctbal, n_name,
         min(l_extendedprice) AS supply_cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_type = 'PROMO' AND p_size <= 10 AND r_name = 'EUROPE'
  GROUP BY 1, 2, 3, 4, 5, 6
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, supply_cost
FROM supply s1
WHERE supply_cost = (
  SELECT min(supply_cost) FROM supply s2 WHERE s2.p_partkey = s1.p_partkey
)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 20
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-shaped important stock identification: per-part shipped
    value (sum of quantity * price) from suppliers of one nation, kept
    when the part's value exceeds a fixed fraction of the nation total.
    The global threshold is a 1-row broadcast cross join (scalar
    subquery decorrelation), NOT a window over an unpartitioned frame.
    Values round to 2 AFTER the threshold compare; the 1/1000 fraction
    keeps every part's value far from the cut so engine summation-order
    ulps cannot flip membership."""
    _prep(spark)
    supp = _t(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 7).select(
        "s_suppkey"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (_m("l_extendedprice") * _m("l_quantity")).alias("__v"),
    )
    vals = track_cache((
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum("__v").alias("__value"))
    ).persist())
    total = vals.agg((F.sum("__value").cast("double") / 1000.0).alias("__cut"))
    return (
        vals.join(
            F.broadcast(total), F.col("__value").cast("double") > F.col("__cut")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("__value", 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), "p_partkey")
    )


_Q11_SQL = """
WITH vals AS (
  SELECT l_partkey, sum(l_extendedprice::DECIMAL(12,2)
                        * l_quantity::DECIMAL(12,2)) AS value
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
  WHERE s_nationkey = 7
  GROUP BY 1
)
SELECT l_partkey AS p_partkey, round(value, 2)::DOUBLE AS part_value
FROM vals
WHERE value::DOUBLE > (SELECT sum(value)::DOUBLE / 1000.0 FROM vals)
ORDER BY part_value DESC, p_partkey
"""


def q12_late_lines_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-shaped shipping-mode priority split (l_linestatus
    stands in for the missing l_shipmode): lines shipped > 30 days
    after their order date during 1996, counted per status as
    high-priority (URGENT/HIGH) vs lower orders. One fact-fact join,
    conditional integer counts — exact across engines."""
    _prep(spark)
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_linestatus", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    late = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        late.groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(is_high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


_Q12_SQL = """
SELECT l_linestatus,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
GROUP BY 1 ORDER BY 1
"""


def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-shaped supplier counting: distinct suppliers that
    shipped each (brand, type, size) combination, excluding one brand
    and 'complaint' suppliers (negative account balance stands in for
    the comment scan). The NOT-IN subquery is an anti-join on a
    broadcast-small exclusion list; counts are exact integers."""
    _prep(spark)
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4") & (F.col("p_size").isin(1, 5, 9, 14, 20, 25, 30, 36))
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(bad_supp),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(20)
    )


_Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#4'
  AND p_size IN (1, 5, 9, 14, 20, 25, 30, 36)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
LIMIT 20
"""


def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-shaped potential-promotion suppliers: suppliers whose
    1996 shipments of some 'red'-named part exceed half their
    all-time quantity for that part. The correlated half-sum threshold
    decorrelates into ONE per-(supplier, part) aggregate with a
    conditional 1996 sum — one lineitem scan instead of two. Quantity
    sums are integral doubles, exact in both engines."""
    _prep(spark)
    red = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    in_96 = (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")
    )
    per_sp = (
        li.join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in_96, F.col("l_quantity")).otherwise(0.0)).alias("__q96"),
            F.sum("l_quantity").alias("__qall"),
        )
        .filter(F.col("__q96") > 0.5 * F.col("__qall"))
        .select("l_suppkey")
        .distinct()
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    return (
        supp.join(per_sp, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("s_name")
    )


_Q20_SQL = """
SELECT s_name, round(s_acctbal, 2) AS s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                   AND l_shipdate < TIMESTAMP '1997-01-01'
                  THEN l_quantity ELSE 0 END) > 0.5 * sum(l_quantity)
)
ORDER BY s_name
"""


def fuzzy_pairs_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching (entity-resolution family): pairs of
    sampled documents whose normalized 50-char prefixes are within 12
    Levenshtein edits. Exact method on a deterministic 10% subset (the
    oracle-checkable semantics; the LSH-candidate variant is the scale
    path, tested for containment in tests)."""
    _prep(spark)
    from energy_pandas_spark.operators.dedup import edit_distance_pairs

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    out = edit_distance_pairs(
        docs, max_distance=12, prefix_len=50, method="exact"
    )
    return out.orderBy("id_a", "id_b")


_FUZZY_SQL = """
WITH k AS (
  SELECT doc_id,
         substr(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 50) AS k
  FROM documents WHERE doc_id % 10 = 0
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, levenshtein(a.k, b.k) AS distance
FROM k a JOIN k b ON a.doc_id < b.doc_id
WHERE levenshtein(a.k, b.k) <= 12
ORDER BY id_a, id_b
"""


def incremental_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup: documents hash-split into an existing
    'store' (70%) and a 'new batch' (30%); the new batch is deduped
    against the store's digests (left_anti) and within itself
    (keep-first) — the standard pipeline shape for continuous corpus
    ingestion."""
    _prep(spark)
    from energy_pandas_spark.operators.dedup import dedup_incremental
    from energy_pandas_spark.operators.sampling import hash_bucket
    from energy_pandas_spark.functions.textfns import normalized_text

    docs = _t(spark, sf_dir, "documents")
    b = hash_bucket("doc_id")
    store = docs.filter(b < 7000).select(
        F.md5(normalized_text("text")).alias("digest")
    )
    new = docs.filter(b >= 7000)
    out = dedup_incremental(new, store)
    return out.select("doc_id", "digest").orderBy("doc_id")


_INCREMENTAL_DEDUP_SQL = """
WITH b AS (
  SELECT doc_id, text,
         md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS digest,
         (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 10000)::INT
           AS bucket
  FROM documents
), store AS (
  SELECT DISTINCT digest FROM b WHERE bucket < 7000
), new_batch AS (
  SELECT doc_id, digest FROM b WHERE bucket >= 7000
)
SELECT doc_id, digest
FROM new_batch n
WHERE NOT EXISTS (SELECT 1 FROM store s WHERE s.digest = n.digest)
QUALIFY row_number() OVER (PARTITION BY digest ORDER BY doc_id) = 1
ORDER BY doc_id
"""


def clean_corpus_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end cleaning pipeline: language filter (en) -> quality
    thresholds -> exact-dedup keep-first; every predicate is an
    integer-ratio compare, so the kept set is engine-exact."""
    _prep(spark)
    from energy_pandas_spark.operators.pipeline import clean_corpus

    docs = _t(spark, sf_dir, "documents")
    out = clean_corpus(docs, min_tokens=10, min_alpha_ratio=0.6,
                       max_repetition_ratio=0.4)
    return out.select(
        "doc_id", "lang_pred", "n_tokens", "fingerprint"
    ).orderBy("doc_id")


def _clean_corpus_core() -> str:
    """The cleaning pipeline as a reusable SQL body: one row per kept
    document with (doc_id, text, lang_pred, n_tokens, fingerprint)."""
    votes, case = _langid_vote_sql()
    return f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\\s+'), x -> x != '')
           AS toks_all,
         string_split(text, '') AS chars
  FROM documents
), s AS (
  SELECT doc_id, text, toks_all,
         {votes}
  FROM (SELECT *, list_distinct(toks_all) AS toks FROM t)
), feat AS (
  SELECT doc_id, text,
         {case} AS lang_pred,
         len(toks_all) AS n_tokens,
         length(regexp_replace(text, '[^\\p{{L}}]', '', 'g'))
           / CAST(CASE WHEN length(text) = 0 THEN 1 ELSE length(text) END
                  AS DOUBLE) AS alpha_ratio,
         1.0 - len(list_distinct(toks_all))
           / CAST(CASE WHEN len(toks_all) = 0 THEN 1 ELSE len(toks_all) END
                  AS DOUBLE) AS repetition_ratio
  FROM s
)
SELECT doc_id, text, lang_pred, n_tokens,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint
FROM feat
WHERE lang_pred = 'en' AND n_tokens >= 10
  AND alpha_ratio >= 0.6 AND repetition_ratio <= 0.4
QUALIFY row_number() OVER (PARTITION BY fingerprint ORDER BY doc_id) = 1
"""


def _clean_corpus_sql() -> str:
    return (
        f"WITH cleaned AS ({_clean_corpus_core()})\n"
        "SELECT doc_id, lang_pred, n_tokens, fingerprint FROM cleaned "
        "ORDER BY doc_id"
    )


def prepare_corpus_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship composed pipeline: clean (lang/quality/exact-dedup) ->
    classifier gate -> span-dedup filter, one lazy plan, engine-exact
    at every predicate. Ships integer micro-ratios (score_micro,
    dup_frac_micro) — both are exact integer ratios whose round(x, 6)
    can land on a decimal half (the sf10 probe observed dup_frac
    0.0640625 tie-breaking differently across engines)."""
    _prep(spark)
    from energy_pandas_spark.operators.pipeline import prepare_training_corpus

    docs = _t(spark, sf_dir, "documents")
    out = prepare_training_corpus(docs)
    return out.select(
        "doc_id",
        "lang_pred",
        "n_tokens",
        "score_micro",
        "n_spans",
        "n_dup_spans",
        "dup_frac_micro",
    ).orderBy("doc_id")


def _prepare_corpus_sql() -> str:
    return f"""
WITH cleaned AS ({_clean_corpus_core()}),
clf AS (
  -- exact integer micro-score (the engine's gate and ship column):
  -- (S * 1e6) // (1024 * n) on BIGINTs — no float, no round, no tie
  SELECT doc_id,
         (CASE WHEN len(toks) = 0 THEN 0
               ELSE (sq * 1000000) // (1024 * len(toks)) END)::BIGINT
           AS score_micro
  FROM (
    SELECT doc_id, toks,
           list_sum(list_transform(toks, tk ->
             (('0x' || substr(md5('clf-v1' || tk), 1, 15))::BIGINT % 2049
                - 1024)))::BIGINT AS sq
    FROM (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x != '') AS toks
      FROM cleaned
    )
  )
),
gated AS (
  SELECT c.doc_id, c.text, c.lang_pred, c.n_tokens, clf.score_micro
  FROM cleaned c JOIN clf USING (doc_id)
  WHERE clf.score_micro >= -50000
),
gtoks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x != '') AS t
  FROM gated
),
grams AS (
  SELECT doc_id, array_to_string(t[i : i + 7], ' ') AS g
  FROM gtoks, LATERAL (SELECT unnest(range(1, len(t) - 6)) AS i)
),
dup AS (SELECT g, count(DISTINCT doc_id) AS n_docs FROM grams GROUP BY 1),
per AS (
  SELECT doc_id, count(*) AS n_spans,
         sum(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup
  FROM grams JOIN dup USING (g) GROUP BY 1
)
SELECT g.doc_id, g.lang_pred, g.n_tokens, g.score_micro,
       coalesce(per.n_spans, 0) AS n_spans,
       coalesce(per.n_dup, 0) AS n_dup_spans,
       (CASE WHEN coalesce(per.n_spans, 0) = 0 THEN 0
             ELSE (per.n_dup * 1000000) // per.n_spans END)::BIGINT
         AS dup_frac_micro
FROM gated g LEFT JOIN per USING (doc_id)
WHERE (CASE WHEN coalesce(per.n_spans, 0) = 0 THEN 0
            ELSE (per.n_dup * 1000000) // per.n_spans END) <= 500000
ORDER BY g.doc_id
"""


def corpus_sketch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass sketch statistics — the 100 TB path for cardinality and
    quantile questions: HLL++ (approx_count_distinct) needs no distinct
    shuffle, KLL-style percentile_approx no global sort. Rows-only by
    nature (sketch estimates are engine-specific); the exact
    counterparts are oracle-checked in corpus_cardinality and
    value_percentiles, and tests bound the sketch error against them."""
    _prep(spark)
    from energy_pandas_spark.functions.textfns import tokens

    docs = _t(spark, sf_dir, "documents")
    ev = _t(spark, sf_dir, "events")
    terms = docs.select(F.explode(tokens("text")).alias("term")).agg(
        F.approx_count_distinct("term", rsd=0.02).alias("approx_terms")
    )
    values = ev.agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("value_q"),
    )
    return terms.crossJoin(values).select(
        "approx_terms",
        "approx_users",
        F.col("value_q")[0].alias("p50"),
        F.col("value_q")[1].alias("p95"),
        F.col("value_q")[2].alias("p99"),
    )


def validate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass data-quality gate (operators/expectations.py:
    validate): eight deequ-style rules — row floor, null checks, key
    uniqueness, range/set/regex membership, per-mille shares —
    compiled into ONE map-combined aggregate over documents (the scan
    happens once no matter how many rules run). Metrics are exact
    integer counts and `div` per-milles, so verdicts are engine-exact;
    bounds are chosen so the suite reports a deterministic mix of
    pass and fail rows on the clean synthetic corpus."""
    _prep(spark)
    from energy_pandas_spark.operators.expectations import (
        expect_in_range,
        expect_in_set,
        expect_matches,
        expect_min_rows,
        expect_no_nulls,
        expect_null_share_below,
        expect_share_at_least,
        expect_unique,
        validate,
    )

    docs = _t(spark, sf_dir, "documents")
    suite = [
        expect_min_rows(100),
        expect_no_nulls("doc_id"),
        expect_unique("doc_id"),
        expect_null_share_below("text", 100),
        expect_in_range("n_chars", 0, 500),
        expect_in_set("lang", ["en", "fr", "de"]),
        expect_matches("source", "src[0-9]"),
        expect_share_at_least("text_min_100", F.length("text") >= 100, 900),
    ]
    # (expectation, column) is unique across this suite -> a total order
    return validate(docs, suite).orderBy("expectation", "column")


_VALIDATE_DOCS_SQL = r"""
WITH a AS (
  SELECT count(*)::BIGINT AS n_rows,
         count(*) FILTER (WHERE doc_id IS NULL)::BIGINT AS null_ids,
         count(*) FILTER (WHERE doc_id IS NOT NULL)::BIGINT AS complete_ids,
         count(DISTINCT doc_id)::BIGINT AS distinct_ids,
         count(*) FILTER (WHERE text IS NULL)::BIGINT AS null_text,
         count(*) FILTER (WHERE n_chars IS NOT NULL
                          AND n_chars NOT BETWEEN 0 AND 500)::BIGINT AS oor_chars,
         count(*) FILTER (WHERE lang IS NOT NULL
                          AND lang NOT IN ('en', 'fr', 'de'))::BIGINT AS bad_lang,
         count(*) FILTER (WHERE source IS NOT NULL
                          AND NOT regexp_full_match(source, '(?:src[0-9])'))
           ::BIGINT AS bad_src,
         count(*) FILTER (WHERE len(text) >= 100)::BIGINT AS long_text
  FROM documents
)
SELECT * FROM (
  SELECT 'min_rows' AS expectation, '*' AS "column",
         n_rows AS metric, 100::BIGINT AS bound, n_rows >= 100 AS ok FROM a
  UNION ALL SELECT 'no_nulls', 'doc_id', null_ids, 0, null_ids <= 0 FROM a
  UNION ALL SELECT 'unique', 'doc_id', complete_ids - distinct_ids, 0,
                   complete_ids - distinct_ids <= 0 FROM a
  UNION ALL SELECT 'null_share_below', 'text',
                   (1000 * null_text) // greatest(n_rows, 1), 100,
                   (1000 * null_text) // greatest(n_rows, 1) <= 100 FROM a
  UNION ALL SELECT 'in_range', 'n_chars', oor_chars, 0, oor_chars <= 0 FROM a
  UNION ALL SELECT 'in_set', 'lang', bad_lang, 0, bad_lang <= 0 FROM a
  UNION ALL SELECT 'matches', 'source', bad_src, 0, bad_src <= 0 FROM a
  UNION ALL SELECT 'share_at_least', 'text_min_100',
                   (1000 * long_text) // greatest(n_rows, 1), 900,
                   (1000 * long_text) // greatest(n_rows, 1) >= 900 FROM a
)
ORDER BY expectation, "column"
"""


def readability_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-milli readability card (operators/text.py:
    readability_stats): word/sentence/vowel-group counts and the
    Flesch / Flesch-Kincaid formulas evaluated entirely in integer
    `div` arithmetic — bit-exact across engines, no float tolerance.
    Map-only codegen projection, zero shuffle."""
    _prep(spark)
    from energy_pandas_spark.operators.text import readability_stats

    docs = _t(spark, sf_dir, "documents")
    return readability_stats(docs).select(
        "doc_id",
        "n_words",
        "n_sentences",
        "n_syllables",
        "wps_milli",
        "spw_milli",
        "flesch_milli",
        "fk_grade_milli",
    ).orderBy("doc_id")


_READABILITY_SQL = r"""
WITH w AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '[a-z]+') AS words,
         len(regexp_extract_all(coalesce(text, ''), '[.!?]+'))::BIGINT
           AS n_sentences
  FROM documents
), c AS (
  SELECT doc_id, n_sentences,
         len(words)::BIGINT AS n_words,
         coalesce(list_sum(list_transform(words,
           x -> greatest(1, len(regexp_extract_all(x, '[aeiouy]+'))))), 0)
           ::BIGINT AS n_syllables
  FROM w
), r AS (
  SELECT doc_id, n_words, n_sentences, n_syllables,
         ((1000 * n_words) // greatest(n_sentences, 1))::BIGINT AS wps_milli,
         ((1000 * n_syllables) // greatest(n_words, 1))::BIGINT AS spw_milli
  FROM c
)
SELECT doc_id, n_words, n_sentences, n_syllables, wps_milli, spw_milli,
       (206835 - (1015 * wps_milli) // 1000 - (84600 * spw_milli) // 1000)
         ::BIGINT AS flesch_milli,
       ((390 * wps_milli) // 1000 + (11800 * spw_milli) // 1000 - 15590)
         ::BIGINT AS fk_grade_milli
FROM r ORDER BY doc_id
"""


def _with_link_html(docs):
    """Deterministic synthetic page (url, html) per document for the
    link-graph queries: every href form the extractor handles —
    absolute (with a hot 'hub.net' target every 4th doc), single-quoted
    with WWW/port/multi-part-suffix canonicalization work, root- and
    protocol-relative resolution against the page URL, plus mailto /
    empty-ish / relative-path hrefs that must NOT resolve."""
    did, src = F.col("doc_id"), F.col("source")
    hub = F.when(did % 4 == 0, F.lit("hub")).otherwise(src)
    html = F.concat(
        F.lit("<p>"), F.coalesce(F.col("text"), F.lit("")),
        F.lit('</p><a href="https://'), hub, F.lit(".net/a/"),
        (did % 5).cast("string"),
        F.lit("\">x</a><a href='HTTP://WWW."), src,
        F.lit(".CO.UK:80/x'>y</a>"),
        F.lit('<a href="/rel/'), (did % 7).cast("string"),
        F.lit('">r</a><a href="//cdn.'), src, F.lit('.net/img">c</a>'),
        F.lit('<a href="mailto:a@b.c">m</a><a href="rel.html">s</a>'),
    )
    url = F.concat(F.lit("https://"), src, F.lit(".org/p/"), did.cast("string"))
    return docs.select("doc_id", url.alias("url"), html.alias("text"))


def link_graph_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level link graph (operators/urls.py:extract_links +
    domain_links) over synthetic pages: href harvesting is a map-only
    regex explode (page text never shuffles), resolution handles
    absolute / protocol-relative / root-relative forms, and only
    (src_domain, dst_domain) pairs enter the one map-combined edge
    aggregate — the crawl-frontier / site-authority input table."""
    _prep(spark)
    from energy_pandas_spark.operators.urls import domain_links

    docs = _t(spark, sf_dir, "documents")
    return domain_links(_with_link_html(docs)).orderBy(
        "src_domain", "dst_domain"
    )


def link_degrees_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain in/out degree card (operators/urls.py:
    link_degree_stats) over the domain link graph — two aggregates +
    one outer join on the domain²-bounded edge table, never the
    corpus."""
    _prep(spark)
    from energy_pandas_spark.operators.urls import (
        domain_links,
        link_degree_stats,
    )

    docs = _t(spark, sf_dir, "documents")
    return link_degree_stats(domain_links(_with_link_html(docs))).orderBy(
        "domain"
    )


def _domain_case_sql(h: str) -> str:
    """DuckDB twin of operators/urls.py:registrable_domain for a host
    expression (the literal CASE _CANON_URL_CTE uses; the built-in
    suffix set is all 2-label so the last-3 arm covers it)."""
    parts = f"string_split({h}, '.')"
    last2 = f"({parts}[-2] || '.' || {parts}[-1])"
    last3 = f"({parts}[-3] || '.' || {parts}[-2] || '.' || {parts}[-1])"
    suffixes = (
        "('co.uk','org.uk','ac.uk','gov.uk','me.uk','net.uk',"
        "'com.au','net.au','org.au','edu.au','gov.au',"
        "'co.jp','ne.jp','or.jp','ac.jp','go.jp',"
        "'co.kr','or.kr','go.kr','com.br','net.br','org.br',"
        "'com.cn','net.cn','org.cn','gov.cn',"
        "'com.mx','com.ar','com.tr','com.sg','com.hk','com.tw',"
        "'co.in','co.za','co.nz','co.id','co.th')"
    )
    return (
        f"CASE WHEN {h} = '' OR {h} IS NULL THEN NULL ELSE "
        f"(CASE WHEN len({parts}) <= 1 THEN {h} "
        f"WHEN len({parts}) >= 3 AND {last2} IN {suffixes} THEN {last3} "
        f"ELSE {last2} END) END"
    )


_HOST_OF_SQL = (
    "regexp_replace(lower(regexp_extract(regexp_extract({col}, "
    r"'^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1), "
    r"'^(?:[^@]*@)?([^:]*)', 1)), '^www\.', '')"
)

_LINK_EDGES_CTE = rf"""
  SELECT doc_id,
         'https://' || source || '.org/p/' || doc_id::VARCHAR AS url,
         '<p>' || coalesce(text, '') || '</p><a href="https://'
         || (CASE WHEN doc_id % 4 = 0 THEN 'hub' ELSE source END)
         || '.net/a/' || (doc_id % 5)::VARCHAR
         || '">x</a><a href=''HTTP://WWW.' || source || '.CO.UK:80/x''>y</a>'
         || '<a href="/rel/' || (doc_id % 7)::VARCHAR
         || '">r</a><a href="//cdn.' || source || '.net/img">c</a>'
         || '<a href="mailto:a@b.c">m</a><a href="rel.html">s</a>' AS html
  FROM documents
), hrefs AS (
  SELECT doc_id, url, unnest(list_concat(
    regexp_extract_all(html, 'href\s*=\s*"([^"]*)"', 1),
    regexp_extract_all(html, 'href\s*=\s*''([^'']*)''', 1))) AS href
  FROM pages
), res AS (
  SELECT doc_id, url,
    CASE
      WHEN regexp_matches(href, '^[A-Za-z][A-Za-z0-9+.\-]*://') THEN href
      WHEN href LIKE '//%'
           AND lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) != ''
           AND regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1) != ''
        THEN lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1))
             || ':' || href
      WHEN href LIKE '/%' AND href NOT LIKE '//%'
           AND lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) != ''
           AND regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1) != ''
        THEN lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1))
             || '://' || regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1)
             || href
      ELSE NULL
    END AS target
  FROM hrefs
), hosts AS (
  SELECT {_HOST_OF_SQL.format(col='url')} AS src_host,
         {_HOST_OF_SQL.format(col='target')} AS dst_host
  FROM res WHERE target IS NOT NULL
), doms AS (
  SELECT {_domain_case_sql('src_host')} AS src_domain,
         {_domain_case_sql('dst_host')} AS dst_domain
  FROM hosts
), edges AS (
  SELECT src_domain, dst_domain, count(*)::BIGINT AS n_links
  FROM doms
  WHERE src_domain IS NOT NULL AND dst_domain IS NOT NULL
  GROUP BY 1, 2
"""

_LINK_GRAPH_SQL = rf"""
WITH pages AS ({_LINK_EDGES_CTE}
)
SELECT src_domain, dst_domain, n_links FROM edges
ORDER BY src_domain, dst_domain
"""

_LINK_DEGREES_SQL = rf"""
WITH pages AS ({_LINK_EDGES_CTE}
), o AS (
  SELECT src_domain AS domain, sum(n_links)::BIGINT AS n_out_links,
         count(*)::BIGINT AS n_out_domains
  FROM edges GROUP BY 1
), i AS (
  SELECT dst_domain AS domain, sum(n_links)::BIGINT AS n_in_links,
         count(*)::BIGINT AS n_in_domains
  FROM edges GROUP BY 1
)
SELECT coalesce(o.domain, i.domain) AS domain,
       coalesce(n_out_links, 0)::BIGINT AS n_out_links,
       coalesce(n_out_domains, 0)::BIGINT AS n_out_domains,
       coalesce(n_in_links, 0)::BIGINT AS n_in_links,
       coalesce(n_in_domains, 0)::BIGINT AS n_in_domains
FROM o FULL OUTER JOIN i ON o.domain = i.domain
ORDER BY domain
"""


def shard_plan_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-targeted sequential shard assignment (operators/
    sharding.py:sequential_shards): exclusive running n_chars in
    doc_id order via the two-level distributed prefix sum — range
    buckets + bucket-local windows + an n_buckets-row offset
    aggregate; no global sort, no single-partition window. The oracle
    is the naive global-window SQL: identical integers by
    construction."""
    _prep(spark)
    from energy_pandas_spark.operators.sharding import sequential_shards

    docs = _t(spark, sf_dir, "documents")
    return (
        sequential_shards(docs, "n_chars", "doc_id", target=20000)
        .select("doc_id", "cum_before", "shard_id")
        .orderBy("doc_id")
    )


_SHARD_PLAN_SQL = r"""
WITH p AS (
  SELECT doc_id,
         coalesce(sum(n_chars) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS cum_before
  FROM documents
)
SELECT doc_id, cum_before, (cum_before // 20000)::BIGINT AS shard_id
FROM p ORDER BY doc_id
"""


def shard_manifest_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The export manifest over the shard plan (operators/sharding.py:
    shard_manifest): per-shard row/weight totals and the covered
    doc_id range — one map-combined aggregate, shard-count-sized."""
    _prep(spark)
    from energy_pandas_spark.operators.sharding import (
        sequential_shards,
        shard_manifest,
    )

    docs = _t(spark, sf_dir, "documents")
    planned = sequential_shards(docs, "n_chars", "doc_id", target=20000)
    return shard_manifest(planned, "n_chars", "doc_id").orderBy("shard_id")


_SHARD_MANIFEST_SQL = r"""
WITH p AS (
  SELECT doc_id, n_chars,
         coalesce(sum(n_chars) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS cum_before
  FROM documents
)
SELECT (cum_before // 20000)::BIGINT AS shard_id,
       count(*)::BIGINT AS n_rows,
       sum(n_chars)::BIGINT AS total_weight,
       min(doc_id) AS first_order,
       max(doc_id) AS last_order
FROM p GROUP BY 1 ORDER BY 1
"""


def domain_rank_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Site authority: integer PageRank (operators/graph.py:pagerank)
    over the domain link graph — the crawl-prioritization composition
    (extract_links -> domain_links -> pagerank). The deliberate hot
    'hub.net' target must surface as the top-ranked domain; ranks are
    pure scaled-integer arithmetic, replayed exactly by the unrolled
    oracle iteration."""
    _prep(spark)
    from energy_pandas_spark.operators.graph import pagerank
    from energy_pandas_spark.operators.urls import domain_links

    docs = _t(spark, sf_dir, "documents")
    edges = domain_links(_with_link_html(docs))
    ranks = pagerank(
        edges, src="src_domain", dst="dst_domain", weight="n_links", n_iter=10
    )
    return ranks.select(F.col("id").alias("domain"), "rank_q").orderBy(
        F.desc("rank_q"), "domain"
    )


def _domain_rank_sql(n_iter: int = 10) -> str:
    """Oracle: the link-edge CTE feeding the same unrolled integer
    PageRank iteration as _event_graph_rank_sql."""
    scale = 1 << 40
    its = []
    prev = "r0"
    for k in range(1, n_iter + 1):
        its.append(
            f"""r{k} AS (
  SELECT nd.u,
         ((3 * ({scale} // nstat.n) + 17 * coalesce(s.s, 0)) // 20)::BIGINT
           AS r
  FROM nodes nd CROSS JOIN nstat
  LEFT JOIN (
    SELECT pe.v AS u, sum((rp.r * pe.w) // ow.ow)::BIGINT AS s
    FROM pe
    JOIN {prev} rp ON rp.u = pe.u
    JOIN outw ow ON ow.u = pe.u
    GROUP BY pe.v
  ) s ON s.u = nd.u
)"""
        )
        prev = f"r{k}"
    iter_ctes = ",\n".join(its)
    return rf"""
WITH pages AS ({_LINK_EDGES_CTE}
), pe AS (
  SELECT src_domain AS u, dst_domain AS v, n_links AS w FROM edges
), outw AS (
  SELECT u, sum(w)::BIGINT AS ow FROM pe GROUP BY 1
), nodes AS (
  SELECT DISTINCT u FROM (SELECT u FROM pe UNION ALL SELECT v AS u FROM pe)
), nstat AS (
  SELECT count(*)::BIGINT AS n FROM nodes
), r0 AS (
  SELECT u, ({scale} // nstat.n)::BIGINT AS r FROM nodes CROSS JOIN nstat
),
{iter_ctes}
SELECT u AS domain, r AS rank_q
FROM {prev} ORDER BY rank_q DESC, domain
"""


# ---------------------------------------------------------------------------
# robots.txt: parse + crawl gate (operators/robots.py)
# ---------------------------------------------------------------------------

# four robots.txt templates covering the spec's group/agent/wildcard
# semantics; domain k gets template k % 4. Kept byte-identical to the
# DuckDB e'...' literals in _ROBOTS_CORPUS_CTE.
_ROBOTS_TEMPLATES = [
    (
        "# robots for site\n"
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/ok/\n"
        "Disallow: /tmp*\n"
        "Disallow:\n"
        "\n"
        "Sitemap: https://example.com/sitemap.xml\n"
    ),
    (
        "User-agent: ccbot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: *\n"
        "Allow: /\n"
    ),
    (
        "User-agent: ccbot\n"
        "User-agent: gptbot\n"
        "Disallow: /*.php$\n"
        "Disallow: /search?q=*\n"
        "Allow: /search?q=ok$\n"
    ),
    (
        "Disallow: /orphan\r\n"
        "USER-AGENT: *   # annotated\r\n"
        "DISALLOW: /a/\r\n"
        "allow: /a/b/\r\n"
    ),
]


def _synth_robots(spark: SparkSession):
    """Deterministic synthetic robots corpus: 50 sites, template by
    k % 4 (star groups, specific-agent groups, consecutive UA lines,
    wildcards/$ anchors, CRLF + case + comment noise, orphan rules)."""
    texts = F.array(*[F.lit(t) for t in _ROBOTS_TEMPLATES])
    return spark.range(50).select(
        F.concat(F.lit("site"), F.col("id").cast("string"), F.lit(".com")).alias(
            "domain"
        ),
        F.element_at(texts, (F.col("id") % 4 + 1).cast("int")).alias("text"),
    )


def robots_rules_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt parsing (operators/robots.py:parse_robots) for agent
    'ccbot' over the synthetic robots corpus: RFC 9309 group structure
    (consecutive User-agent lines share one group, a User-agent line
    after rules opens a new one, pre-group rules are ignored) and
    most-specific-wins agent selection (a named 'ccbot' group silences
    the '*' groups). Comment strip, CRLF fold, case-insensitive
    directives, empty-Disallow drop. One posexplode + per-site windows
    — never a single-partition window."""
    _prep(spark)
    from energy_pandas_spark.operators.robots import parse_robots

    robots = _synth_robots(spark)
    return parse_robots(robots, agent="ccbot").orderBy(
        "domain", "allow", "path"
    )


_ROBOTS_CORPUS_CTE = r"""
  SELECT 'site' || k::VARCHAR || '.com' AS domain,
         CASE k % 4
           WHEN 0 THEN e'# robots for site\nUser-agent: *\nDisallow: /private/\nAllow: /private/ok/\nDisallow: /tmp*\nDisallow:\n\nSitemap: https://example.com/sitemap.xml\n'
           WHEN 1 THEN e'User-agent: ccbot\nDisallow: /\n\nUser-agent: *\nAllow: /\n'
           WHEN 2 THEN e'User-agent: ccbot\nUser-agent: gptbot\nDisallow: /*.php$\nDisallow: /search?q=*\nAllow: /search?q=ok$\n'
           ELSE e'Disallow: /orphan\r\nUSER-AGENT: *   # annotated\r\nDISALLOW: /a/\r\nallow: /a/b/\r\n'
         END AS text
  FROM range(50) t(k)
"""

# the DuckDB twin of operators/robots.py:parse_robots (agent 'ccbot')
# — the LITERAL same Java∩RE2 regexes and window algebra
_ROBOTS_RULES_CTE = r"""
  SELECT domain,
         generate_subscripts(l, 1) AS idx,
         trim(regexp_replace(unnest(l), '#.*$', '')) AS line
  FROM (SELECT domain,
               string_split(replace(text, chr(13), ''), chr(10)) AS l
        FROM rb)
), fl AS (
  SELECT domain, idx, line,
    regexp_matches(line, '(?i)^user-agent\s*:') AS is_ua,
    lower(trim(regexp_extract(line, '(?i)^user-agent\s*:(.*)$', 1))) AS ua,
    regexp_matches(line, '(?i)^(dis)?allow\s*:') AS is_rule,
    regexp_matches(line, '(?i)^allow\s*:') AS is_allow,
    trim(regexp_extract(line, '(?i)^(dis)?allow\s*:(.*)$', 2)) AS path
  FROM ln
), g0 AS (
  SELECT *, coalesce(
    lag(is_ua) OVER (PARTITION BY domain ORDER BY idx), false) AS prev_ua
  FROM fl
), g AS (
  SELECT *, sum(CASE WHEN is_ua AND NOT prev_ua THEN 1 ELSE 0 END)
    OVER (PARTITION BY domain ORDER BY idx ROWS UNBOUNDED PRECEDING) AS grp
  FROM g0
), sc AS (
  SELECT *,
    max(CASE WHEN is_ua AND ua = '*' THEN 1 ELSE 0 END)
      OVER (PARTITION BY domain, grp) AS has_star,
    max(CASE WHEN is_ua AND ua = 'ccbot' THEN 1 ELSE 0 END)
      OVER (PARTITION BY domain, grp) AS has_agent,
    max(CASE WHEN is_ua AND ua = 'ccbot' THEN 1 ELSE 0 END)
      OVER (PARTITION BY domain) AS any_specific
  FROM g
), rules AS (
  SELECT domain, is_allow AS allow, path, len(path)::INT AS rule_len
  FROM sc
  WHERE is_rule AND grp >= 1 AND path != ''
    AND (has_agent = 1 OR (has_star = 1 AND any_specific = 0))
"""

_ROBOTS_RULES_SQL = rf"""
WITH rb AS ({_ROBOTS_CORPUS_CTE}
), ln AS ({_ROBOTS_RULES_CTE}
)
SELECT domain, allow, path, rule_len
FROM rules ORDER BY domain, allow, path
"""


def robots_gate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-permission gating (operators/robots.py:apply_robots):
    pages on the 50 synthetic robots sites, longest-raw-path rule wins
    with Allow beating Disallow on ties; unmatched pages (and sites
    with no applicable rules) stay allowed. One corpus x broadcast-
    rules equi-join on the site key + LIKE-pattern match (robots ``*``
    -> ``%``, trailing ``$`` anchors) + one argmax aggregate — page
    text never enters the rule join."""
    _prep(spark)
    from energy_pandas_spark.operators.robots import apply_robots, parse_robots

    rules = parse_robots(_synth_robots(spark), agent="ccbot")
    docs = _t(spark, sf_dir, "documents")
    paths = F.array(
        F.lit("/private/x"),
        F.lit("/private/ok/x"),
        F.lit("/tmp123"),
        F.lit("/index.php"),
        F.lit("/index.php?x=1"),
        F.lit("/search?q=cats"),
        F.lit("/a/b/c"),
        F.lit("/search?q=ok"),
    )
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://site"),
            (F.col("doc_id") % 50).cast("string"),
            F.lit(".com"),
            F.element_at(paths, (F.col("doc_id") % 8 + 1).cast("int")),
        ).alias("url"),
    )
    return apply_robots(pages, F.broadcast(rules)).orderBy("doc_id")


_ROBOTS_GATE_SQL = rf"""
WITH rb AS ({_ROBOTS_CORPUS_CTE}
), ln AS ({_ROBOTS_RULES_CTE}
), pg AS (
  SELECT doc_id,
         'https://site' || (doc_id % 50)::VARCHAR || '.com' ||
         CASE doc_id % 8
           WHEN 0 THEN '/private/x'
           WHEN 1 THEN '/private/ok/x'
           WHEN 2 THEN '/tmp123'
           WHEN 3 THEN '/index.php'
           WHEN 4 THEN '/index.php?x=1'
           WHEN 5 THEN '/search?q=cats'
           WHEN 6 THEN '/a/b/c'
           ELSE '/search?q=ok'
         END AS url
  FROM documents
), tg AS (
  -- the apply_robots URL decomposition (url_domain of a 2-label host
  -- is the www-stripped host itself; path defaults to '/', ?query
  -- rides the match target)
  SELECT doc_id, url,
    regexp_replace(lower(regexp_extract(
      regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1),
      '^(?:[^@]*@)?([^:]*)', 1)), '^www\.', '') AS pkey,
    (CASE WHEN regexp_extract(url,
            '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1) = ''
          THEN '/' ELSE regexp_extract(url,
            '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1) END)
    || (CASE WHEN regexp_extract(url, '^[^#]*\?([^#]*)', 1) = ''
             THEN '' ELSE '?' || regexp_extract(url, '^[^#]*\?([^#]*)', 1)
        END) AS target
  FROM pg
), m AS (
  SELECT t.doc_id, r.allow, r.path,
    row_number() OVER (PARTITION BY t.doc_id
                       ORDER BY r.rule_len DESC, r.allow DESC, r.path DESC)
      AS rn
  FROM tg t JOIN rules r ON r.domain = t.pkey
  WHERE t.target LIKE (
    CASE WHEN right(r.path, 1) = '$'
         THEN replace(replace(replace(replace(
                substr(r.path, 1, len(r.path) - 1),
                '\', '\\'), '%', '\%'), '_', '\_'), '*', '%')
         ELSE replace(replace(replace(replace(
                r.path,
                '\', '\\'), '%', '\%'), '_', '\_'), '*', '%') || '%'
    END) ESCAPE '\'
)
SELECT p.doc_id, p.url,
       coalesce(m.allow, true) AS allowed,
       m.path AS matched_rule
FROM tg p LEFT JOIN (SELECT * FROM m WHERE rn = 1) m USING (doc_id)
ORDER BY p.doc_id
"""


def fetch_waves_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness-aware crawl scheduling (operators/urls.py:
    plan_fetch_waves): at most one URL per registrable domain per
    wave (rank by priority desc, url asc), every domain pinned to one
    fetcher slot by stable md5 bucket, per-domain queues capped at
    max_waves=5 via the engine's two-stage bounded top-k (no unbounded
    per-domain window task). The oracle derives the domain from the
    same synthetic construction (clean two-label hosts make url_domain
    the identity on 'siteK.com')."""
    _prep(spark)
    from energy_pandas_spark.operators.urls import plan_fetch_waves

    docs = _t(spark, sf_dir, "documents")
    frontier = docs.select(
        F.concat(
            F.lit("https://site"),
            (F.col("doc_id") % 25).cast("string"),
            F.lit(".com/p/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        (F.col("doc_id") % 17).alias("n_refs"),
    )
    return plan_fetch_waves(frontier, n_workers=8, max_waves=5).orderBy(
        "domain", "wave"
    )


_FETCH_WAVES_SQL = r"""
WITH fr AS (
  SELECT 'https://site' || (doc_id % 25)::VARCHAR || '.com/p/'
           || doc_id::VARCHAR AS url,
         'site' || (doc_id % 25)::VARCHAR || '.com' AS domain,
         (doc_id % 17)::BIGINT AS priority
  FROM documents
), r AS (
  SELECT url, domain, priority,
         row_number() OVER (PARTITION BY domain
                            ORDER BY priority DESC, url ASC) AS wave
  FROM fr
)
SELECT url, domain, priority,
       (('0x' || substr(md5('crawl-v1:' || domain), 1, 15))::BIGINT % 8)::INT
         AS worker,
       wave::INT AS wave
FROM r WHERE wave <= 5 ORDER BY domain, wave
"""


def hll_distinct_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable HyperLogLog distinct-term estimates per language
    (operators/sketches.py:hll_registers/hll_estimate): md5-hex-prefix
    registers, integer harmonic state, small-range linear counting via
    an exact in-plan integer lookup (quantize=1024 — JVM and libm ln
    disagree by 1 ulp on ~7% of inputs, so the runtime-ln branch can't
    sit under the hash gate; the table can). The DuckDB oracle REPLAYS
    the sketch bit-for-bit, hash collisions included (the
    cm_term_counts_docs precedent: an approximate sketch under the
    full value-hash gate, unlike the rows-only DataSketches queries).
    One explode + map-combined (lang, bucket) max aggregate — at most
    256 register rows per language ever shuffle."""
    _prep(spark)
    from energy_pandas_spark.functions.textfns import tokens
    from energy_pandas_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(tokens(F.coalesce(F.col("text"), F.lit("")))).alias("term"),
    )
    regs = hll_registers(toks, "term", by="lang", lgm=8)
    return hll_estimate(regs, by="lang", lgm=8, quantize=1024).orderBy("lang")


def _hll_oracle_sql(
    src: str, key: str, lgm: int = 8, quantize: int = 1024
) -> str:
    """Shared portable-HLL oracle body: replay the md5 registers, the
    exact integer harmonic state, and the SAME linear-counting lookup
    table hll_estimate builds (both sides derive it from Python libm
    once). ``src`` is a CTE body yielding (``key``, val VARCHAR)."""
    import math

    from energy_pandas_spark.util import round_half_away

    m = 1 << lgm
    b = 60 - lgm
    table = ", ".join(
        str(round_half_away(quantize * m * math.log(m / v)))
        for v in range(1, m + 1)
    )
    scale = repr(float(m * m * (1 << (b + 1))))
    return rf"""
WITH src AS (
{src}
), h AS (
  SELECT {key}, ('0x' || substr(md5(val), 1, 15))::BIGINT AS v FROM src
), br AS (
  SELECT {key}, (v % {m})::INT AS bucket,
         (CASE WHEN (v >> {lgm}) = 0 THEN {b + 1}
               ELSE {b} - (length(bin(v >> {lgm})) - 1) END)::INT AS rho
  FROM h
), regs AS (
  SELECT {key}, bucket, max(rho) AS r FROM br GROUP BY 1, 2
), agg AS (
  SELECT {key}, count(*)::BIGINT AS present,
         sum(1::BIGINT << ({b + 1} - r))::BIGINT AS zp
  FROM regs GROUP BY 1
), st AS (
  SELECT {key}, ({m} - present)::BIGINT AS n_zero,
         (zp + ({m} - present) * (1::BIGINT << {b + 1}))::BIGINT AS z_scaled
  FROM agg
), est AS (
  SELECT {key}, n_zero, z_scaled,
         (0.7213::DOUBLE / (1.0::DOUBLE + 1.079::DOUBLE / {float(m)!r}::DOUBLE))
           * {scale} / z_scaled::DOUBLE AS raw
  FROM st
)
SELECT {key}, {m} AS m, n_zero, z_scaled,
       CASE WHEN raw <= {2.5 * m!r} AND n_zero > 0
            THEN ([{table}])[n_zero::INT]::BIGINT
            ELSE round(raw * {float(quantize)!r})::BIGINT
       END AS est_distinct_q
FROM est ORDER BY {key}
"""


def _hll_distinct_sql(lgm: int = 8, quantize: int = 1024) -> str:
    """Oracle for hll_distinct_docs: distinct terms per language."""
    return _hll_oracle_sql(
        r"""  SELECT lang,
         unnest(list_filter(string_split_regex(lower(coalesce(text, '')),
                                               '\s+'), x -> x != '')) AS val
  FROM documents""",
        key="lang",
        lgm=lgm,
        quantize=quantize,
    )


def _sketch_rollup_sql(lgm: int = 8, quantize: int = 1024) -> str:
    """Oracle for sketch_rollup_users: the per-type merge of per-day
    register tables is one integer max on (type, bucket) — bit-equal
    to building the register table per type from raw rows, so the
    oracle skips the day level entirely and replays the merged sketch
    directly."""
    return _hll_oracle_sql(
        "  SELECT event_type, user_id::VARCHAR AS val FROM events",
        key="event_type",
        lgm=lgm,
        quantize=quantize,
    )


# Oracle for doc_min_fingerprint: replay normalization (lower,
# collapse \s+, trim), char 5-shingles (whole string when shorter),
# and the portable 60-bit md5 hash; min per doc; NULL text -> NULL.
_DOC_MIN_FP_SQL = r"""
WITH norm AS (
  SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS s
  FROM documents
), sh AS (
  SELECT doc_id, substr(s, i, 5) AS g
  FROM norm, unnest(range(1, length(s) - 3)) AS t(i)
  WHERE length(s) >= 5
  UNION ALL
  SELECT doc_id, s AS g FROM norm WHERE s IS NOT NULL AND length(s) < 5
), fp AS (
  SELECT doc_id, min(('0x' || substr(md5(g), 1, 15))::BIGINT) AS min_fp
  FROM sh GROUP BY 1
)
SELECT d.doc_id, fp.min_fp
FROM documents d LEFT JOIN fp USING (doc_id)
ORDER BY d.doc_id
"""

# Oracle for simhash_pairs: replay the md5-token SimHash (bit votes
# over the 60 hash bits; token-less docs sign 0) and brute-force ALL
# pairs at hamming <= 3 — banding recall is pigeonhole-guaranteed, so
# the LSH pair set must equal the brute-force set (a fired bucket cap
# would surface here as a missing pair).
_SIMHASH_PAIRS_SQL = r"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x != '')) AS t
  FROM documents WHERE text IS NOT NULL
), h AS (
  SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS v FROM tok
), votes AS (
  SELECT doc_id, b AS bit,
         sum(CASE WHEN (v >> b) & 1 = 1 THEN 1 ELSE 0 END)::BIGINT AS ones,
         count(*)::BIGINT AS n
  FROM h CROSS JOIN (SELECT unnest(range(0, 60)) AS b) bits
  GROUP BY 1, 2
), sig0 AS (
  SELECT doc_id,
         sum(CASE WHEN 2 * ones > n THEN (1::BIGINT << bit)
                  ELSE 0::BIGINT END)::BIGINT AS sh
  FROM votes GROUP BY 1
), sigs AS (
  SELECT d.doc_id, coalesce(s.sh, 0)::BIGINT AS sh
  FROM documents d LEFT JOIN sig0 s USING (doc_id)
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.sh, b.sh))::INT AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= 3
ORDER BY id_a, id_b
"""


def pack_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency card (operators/packing.py:packing_stats)
    over the same 256-token / 8-bucket layout pack_sequences_docs
    verifies: total tokens, sequences, tail-padding waste and integer
    utilization permille, in one corpus scan + two tiny aggregates
    (all waste in concatenate-and-chunk is per-bucket tails)."""
    _prep(spark)
    from energy_pandas_spark.operators.packing import (
        pack_sequences,
        packing_stats,
    )
    from energy_pandas_spark.operators.text import token_count

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    packed = pack_sequences(docs, "n_tokens", budget=256, n_buckets=8)
    return packing_stats(packed, "n_tokens", budget=256)


_PACK_STATS_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x != ''))::BIGINT AS n_tokens,
         (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 8)::INT
           AS pack_bucket
  FROM documents
), per AS (
  SELECT pack_bucket, count(*)::BIGINT AS docs, sum(n_tokens)::BIGINT AS t,
         ((sum(n_tokens) + 255) // 256)::BIGINT AS seqs
  FROM toks GROUP BY 1
)
SELECT count(*)::BIGINT AS n_buckets_used,
       sum(docs)::BIGINT AS n_docs,
       sum(t)::BIGINT AS total_tokens,
       sum(seqs)::BIGINT AS n_seqs,
       (sum(seqs) * 256)::BIGINT AS capacity,
       (sum(seqs) * 256 - sum(t))::BIGINT AS waste_tokens,
       ((1000 * sum(t)) // (sum(seqs) * 256))::BIGINT AS utilization_permille
FROM per
"""


def token_length_hist_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language power-of-two histogram of document token counts
    (operators/diagnostics.py:length_histogram): bucket b holds counts
    in [2^b, 2^(b+1)) via exact integer floor(log2) — length(bin(v))-1,
    no float log — so the distribution card is engine-portable. One
    map-combined aggregate, ~64 rows per language out."""
    _prep(spark)
    from energy_pandas_spark.operators.diagnostics import length_histogram
    from energy_pandas_spark.operators.text import token_count

    docs = _t(spark, sf_dir, "documents").select(
        "lang", token_count("text").cast("long").alias("n_tokens")
    )
    return length_histogram(docs, "n_tokens", by="lang").orderBy(
        "lang", "bucket"
    )


_TOKEN_LENGTH_HIST_SQL = r"""
WITH tc AS (
  SELECT lang,
         len(list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x != ''))::BIGINT AS v
  FROM documents
), b AS (
  SELECT lang,
         (CASE WHEN v <= 0 THEN -1 ELSE length(bin(v)) - 1 END)::INT AS bucket,
         v
  FROM tc
)
SELECT lang, bucket,
       (CASE WHEN bucket < 0 THEN 0 ELSE (1::BIGINT << bucket) END)::BIGINT
         AS lo,
       (CASE WHEN bucket < 0 THEN 0
             ELSE (1::BIGINT << (bucket + 1)) - 1 END)::BIGINT AS hi,
       count(*)::BIGINT AS n_rows,
       sum(v)::BIGINT AS sum_value
FROM b GROUP BY 1, 2 ORDER BY lang, bucket
"""


def kn_lm_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram log-likelihood (operators/
    text.py:kneser_ney_score): the textbook smoothed LM (d = 3/4,
    continuation counts, interpolated backoff) trained on the src0
    slice, scoring every document as an order-free BIGINT sum of
    1/2^20-nat quantized position logs; OOV positions (unseen context,
    or zero continuation mass) are counted, never scored. Vocab-sized
    model tables, hash joins on the bigram stream, one per-doc
    aggregate. 1-ulp libm ln caveat at quantization boundaries (the
    BM25/DSIR precedent)."""
    _prep(spark)
    from energy_pandas_spark.operators.text import (
        bigram_lm_train,
        kneser_ney_score,
    )

    docs = _t(spark, sf_dir, "documents")
    lm = bigram_lm_train(docs.filter(F.col("source") == "src0"))
    return kneser_ney_score(docs, lm).orderBy("doc_id")


_KN_LM_SCORE_SQL = r"""
WITH toks AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x != '') AS t
  FROM documents
),
bg AS (
  SELECT doc_id, source, t[i] AS w1, t[i + 1] AS w2
  FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i)
),
lm AS (
  SELECT w1, w2, count(*) AS c12 FROM bg WHERE source = 'src0'
  GROUP BY 1, 2
),
ctx AS (
  SELECT w1, sum(c12)::BIGINT AS c1, count(*)::BIGINT AS n1p
  FROM lm GROUP BY 1
),
cont AS (SELECT w2, count(*)::BIGINT AS ncont FROM lm GROUP BY 1),
b AS (SELECT count(*)::BIGINT AS b FROM lm),
sc AS (
  SELECT g.doc_id,
         CASE WHEN c.c1 IS NULL
                OR (coalesce(l.c12, 0) = 0 AND coalesce(n.ncont, 0) = 0)
              THEN 1 ELSE 0 END AS oov,
         CASE WHEN c.c1 IS NULL
                OR (coalesce(l.c12, 0) = 0 AND coalesce(n.ncont, 0) = 0)
              THEN 0
              ELSE round(ln(
                greatest(4 * coalesce(l.c12, 0) - 3, 0)::DOUBLE
                  / (4 * c.c1)::DOUBLE
                + ((3 * c.n1p)::DOUBLE / (4 * c.c1)::DOUBLE)
                  * (coalesce(n.ncont, 0)::DOUBLE / b.b::DOUBLE)
              ) * 1048576.0)::BIGINT END AS lpq
  FROM bg g
  LEFT JOIN lm l ON g.w1 = l.w1 AND g.w2 = l.w2
  LEFT JOIN ctx c ON g.w1 = c.w1
  LEFT JOIN cont n ON g.w2 = n.w2
  CROSS JOIN b
),
per AS (
  SELECT doc_id, count(*)::BIGINT AS n_bigrams, sum(oov)::BIGINT AS n_oov,
         sum(lpq)::BIGINT AS logprob_q
  FROM sc GROUP BY 1
)
SELECT d.doc_id,
       coalesce(per.n_bigrams, 0)::BIGINT AS n_bigrams,
       coalesce(per.n_oov, 0)::BIGINT AS n_oov,
       coalesce(per.logprob_q, 0)::BIGINT AS logprob_q
FROM documents d LEFT JOIN per USING (doc_id)
ORDER BY d.doc_id
"""


def corpus_delta_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shippable refresh (operators/pipeline.py:corpus_delta) over
    the corpus_diff_docs fixture: added/changed rows carry the new
    snapshot's text, removed rows ship id+status only, unchanged rows
    (the bulk) are absent — what an incremental consumer actually
    moves. corpus_patch(old, this) == new is the tested round-trip.
    Diff ships two longs per row; text joins in for the delta ids
    only."""
    _prep(spark)
    from energy_pandas_spark.operators.pipeline import corpus_delta

    docs = _t(spark, sf_dir, "documents")
    changed = docs.filter(F.col("doc_id") % 7 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" changed"))
        ).otherwise(F.col("text")),
    )
    added = docs.filter(F.col("doc_id") % 13 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    new = changed.unionByName(added)
    return (
        corpus_delta(docs, new)
        .select("doc_id", "status", "text")
        .orderBy("doc_id", "status")
    )


_CORPUS_DELTA_SQL = r"""
WITH old AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g')))
           AS d
  FROM documents
), new_src AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0 THEN text || ' changed' ELSE text END AS text
  FROM documents WHERE doc_id % 7 != 0
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 13 = 0
), new AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g')))
           AS d
  FROM new_src
), j AS (
  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
         CASE WHEN o.d IS NULL THEN 'added'
              WHEN n.d IS NULL THEN 'removed'
              WHEN o.d = n.d THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM old o FULL JOIN new n ON o.doc_id = n.doc_id
)
SELECT j.doc_id, j.status, ns.text
FROM j LEFT JOIN new_src ns ON j.doc_id = ns.doc_id
WHERE j.status != 'unchanged'
ORDER BY j.doc_id, j.status
"""


def neardup_eval_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup quality measurement (operators/dedup.py:neardup_eval):
    every 9th document plus a 12-token-suffixed mutant (Jaccard vs its
    original spreads with doc length, straddling both thresholds);
    predictions = minhash LSH at threshold 0.8 (32x2 banding — miss
    6e-15, so exact j >= 0.8 replays it); truth = exact Jaccard at the
    rational 1/2. The card shows the deliberate recall gap: mid-range
    [0.5, 0.8) pairs are true dups the 0.8 predictor must miss, while
    precision stays 1000. Ground truth is brute-force over the bounded
    fixture by design (the op's documented quadratic-in-sample
    contract)."""
    _prep(spark)
    from energy_pandas_spark.operators.dedup import (
        minhash_lsh_pairs,
        neardup_eval,
    )

    base = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 9 == 0)
        .select("doc_id", "text")
    )
    suffix = " zza zzb zzc zzd zze zzf zzg zzh zzi zzj zzk zzl"
    mut = base.select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(suffix)).alias("text"),
    )
    corpus = base.unionByName(mut)
    pred = minhash_lsh_pairs(
        corpus, threshold=0.8, num_hashes=64, bands=32
    )
    return neardup_eval(
        corpus, pred, truth_threshold=(1, 2), sample_permille=1000
    )


_NEARDUP_EVAL_SQL = r"""
WITH base AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 9 = 0
), corpus AS (
  SELECT doc_id, text FROM base
  UNION ALL
  SELECT doc_id + 5000000 AS doc_id,
         text || ' zza zzb zzc zzd zze zzf zzg zzh zzi zzj zzk zzl' AS text
  FROM base
), sh AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(toks) < 3
           THEN [array_to_string(toks, ' ')]
           ELSE [array_to_string(toks[i:i+2], ' ')
                 for i in range(1, len(toks) - 1)]
         END) AS s
  FROM (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'),
                       x -> x != '') AS toks
    FROM corpus
  )
), pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         len(list_intersect(a.s, b.s))::BIGINT AS i,
         (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))::BIGINT AS u
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
), truth AS (
  SELECT id_a, id_b FROM pairs WHERE u > 0 AND 2 * i >= u
), predt AS (
  -- the 0.8-threshold LSH predictor replays as exact j >= 0.8
  SELECT id_a, id_b FROM pairs WHERE u > 0 AND 10 * i >= 8 * u
), m AS (
  SELECT coalesce(p.one, 0) AS p, coalesce(t.one, 0) AS t
  FROM (SELECT id_a, id_b, 1 AS one FROM predt) p
  FULL JOIN (SELECT id_a, id_b, 1 AS one FROM truth) t
    USING (id_a, id_b)
), c AS (
  SELECT (SELECT count(*) FROM corpus)::BIGINT AS n_sample,
         sum(t)::BIGINT AS n_true_pairs,
         sum(p)::BIGINT AS n_pred_pairs,
         sum(p * t)::BIGINT AS tp
  FROM m
)
SELECT n_sample, n_true_pairs, n_pred_pairs, tp,
       (n_pred_pairs - tp)::BIGINT AS fp,
       (n_true_pairs - tp)::BIGINT AS fn,
       (CASE WHEN n_pred_pairs = 0 THEN 1000
             ELSE (1000 * tp) // n_pred_pairs END)::BIGINT
         AS precision_permille,
       (CASE WHEN n_true_pairs = 0 THEN 1000
             ELSE (1000 * tp) // n_true_pairs END)::BIGINT
         AS recall_permille
FROM c
"""


def span_corrupt_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic T5-style span corruption (operators/text.py:
    span_corrupt): md5-seeded span starts (no RNG state), fixed-length
    spans with merged overlaps, ``<extra_id_k>`` sentinels in the
    input, sentinel-prefixed spans in the target — the denoising
    training-pair generator, lossless by construction (tested). One
    posexplode + per-document windows + one re-assembly shuffle; the
    oracle replays the identical md5 arithmetic and window algebra."""
    _prep(spark)
    from energy_pandas_spark.operators.text import span_corrupt

    docs = _t(spark, sf_dir, "documents")
    return span_corrupt(docs).orderBy("doc_id")


_SPAN_CORRUPT_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                     x -> x != '') AS t
  FROM documents
), ex AS (
  SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS i FROM toks
), st AS (
  SELECT doc_id, i, tok,
         CASE WHEN ('0x' || substr(md5('span-v1:' || doc_id::VARCHAR || ':'
                                       || i::VARCHAR), 1, 15))::BIGINT
                   % 1000 < 60
              THEN 1 ELSE 0 END AS s
  FROM ex
), cov AS (
  SELECT *, max(s) OVER (PARTITION BY doc_id ORDER BY i
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) = 1
              AS covered
  FROM st
), run0 AS (
  SELECT *, covered AND NOT coalesce(
              lag(covered) OVER (PARTITION BY doc_id ORDER BY i), false)
              AS run_start
  FROM cov
), runs AS (
  SELECT *, sum(CASE WHEN run_start THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY i
                    ROWS UNBOUNDED PRECEDING) AS run_id
  FROM run0
), pieces AS (
  SELECT doc_id, i, covered,
    CASE WHEN NOT covered THEN [tok]
         WHEN run_start THEN ['<extra_id_' || (run_id - 1)::VARCHAR || '>']
         ELSE [] END AS inp,
    CASE WHEN run_start
           THEN ['<extra_id_' || (run_id - 1)::VARCHAR || '>', tok]
         WHEN covered THEN [tok] ELSE [] END AS tgt
  FROM runs
), per AS (
  SELECT doc_id,
         array_to_string(flatten(list(inp ORDER BY i)), ' ') AS input_text,
         array_to_string(flatten(list(tgt ORDER BY i)), ' ') AS target_text,
         count(*)::BIGINT AS n_tokens,
         sum(CASE WHEN covered THEN 1 ELSE 0 END)::BIGINT AS n_masked
  FROM pieces GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(per.input_text, '') AS input_text,
       coalesce(per.target_text, '') AS target_text,
       coalesce(per.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(per.n_masked, 0)::BIGINT AS n_masked
FROM documents d LEFT JOIN per USING (doc_id)
ORDER BY d.doc_id
"""


def calibration_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier reliability card (operators/diagnostics.py:
    calibration_curve): synthetic scorer score = (37 id mod 1000)/1000
    with labels drawn at rate score^2 via an independent md5 bucket —
    a deliberately over-confident filter, so the card shows observed
    positive permille under predicted confidence in every bin, worst
    mid-range. One deterministic quantization + one map-combined
    aggregate; <= 10 rows out; all-integer after the quantize."""
    _prep(spark)
    from energy_pandas_spark.operators.diagnostics import calibration_curve
    from energy_pandas_spark.operators.sampling import hash_bucket

    docs = _t(spark, sf_dir, "documents")
    scored = (
        docs.select(
            "doc_id",
            ((F.col("doc_id") * 37) % 1000).alias("__spm"),
            hash_bucket(
                F.concat(F.lit("lbl:"), F.col("doc_id").cast("string")), 1000
            ).alias("__b"),
        )
        .select(
            (F.col("__spm").cast("double") / F.lit(1000.0)).alias("score"),
            (F.col("__b") < F.expr("(__spm * __spm) div 1000"))
            .cast("int")
            .alias("label"),
        )
    )
    return calibration_curve(scored, "score", "label").orderBy("bin")


_CALIBRATION_SQL = r"""
WITH sc AS (
  SELECT doc_id, (doc_id * 37) % 1000 AS s_pm,
         ((doc_id * 37) % 1000)::DOUBLE / 1000.0::DOUBLE AS score
  FROM documents
), lab AS (
  SELECT score,
         CASE WHEN ('0x' || substr(md5('lbl:' || doc_id::VARCHAR), 1, 15))
                     ::BIGINT % 1000
                   < (s_pm * s_pm) // 1000
              THEN 1 ELSE 0 END AS label
  FROM sc
), q AS (
  SELECT greatest(least(floor(score * 10), 9), 0)::INT AS bin,
         round(score * 1000000.0)::BIGINT AS sq, label
  FROM lab
), agg AS (
  SELECT bin, count(*)::BIGINT AS n_rows, sum(label)::BIGINT AS n_positive,
         sum(sq)::BIGINT AS score_q_sum
  FROM q GROUP BY 1
)
SELECT bin, n_rows, n_positive, score_q_sum,
       ((1000 * n_positive) // n_rows)::BIGINT AS positive_permille,
       ((1000 * score_q_sum) // (1000000 * n_rows))::BIGINT AS conf_permille
FROM agg ORDER BY bin
"""


# ---------------------------------------------------------------------------
# Unicode hygiene (operators/normalize.py): cleanup chain, mojibake
# detect + repair, NFC normalization. The corpus itself is clean ASCII,
# so deterministic dirt is injected around the text (the
# html_extract_docs precedent) and both engines replay the SAME regex
# constants (Java∩RE2 subset, interpolated verbatim below).
# ---------------------------------------------------------------------------

from energy_pandas_spark.operators.normalize import (  # noqa: E402
    ALT_SPACE_CLASS as _N_ALT,
    CONTROL_CLASS as _N_CTRL,
    MOJIBAKE_MARKER as _N_MOJI,
    ZERO_WIDTH_CLASS as _N_ZW,
)


def clean_text_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace/control hygiene (operators/normalize.py:clean_text_stats)
    over documents wrapped in deterministic dirt (tab+NBSP head, CRLF,
    zero-width + C0 control + trailing-space tail). One map-only codegen
    projection: zero shuffle, no Python workers."""
    _prep(spark)
    from energy_pandas_spark.operators.normalize import clean_text_stats

    docs = _t(spark, sf_dir, "documents")
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.lit("\t head\r\n"),
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" ​zw tail  "),
        ).alias("text"),
    )
    return (
        clean_text_stats(wrapped)
        .select(
            "doc_id",
            "n_ctrl",
            "n_zero_width",
            "n_alt_space",
            "changed",
            F.col("text_clean"),
            F.length("text_clean").cast("long").alias("n_chars_clean"),
        )
        .orderBy("doc_id")
    )


_CLEAN_TEXT_SQL = f"""
WITH wrapped AS (
  SELECT doc_id,
         chr(9) || chr(160) || 'head' || chr(13) || chr(10)
         || coalesce(text, '')
         || ' ' || chr(8203) || 'zw' || chr(7) || ' tail  ' AS t
  FROM documents
), c AS (
  SELECT doc_id, t,
    trim(
      regexp_replace(
      regexp_replace(
      regexp_replace(
      regexp_replace(
      regexp_replace(
      regexp_replace(t,
        '\\x{{000D}}\\x{{000A}}?', chr(10), 'g'),
        '{_N_CTRL}', '', 'g'),
        '{_N_ZW}', '', 'g'),
        '{_N_ALT}', ' ', 'g'),
        '[ \\x{{0009}}]+', ' ', 'g'),
        '[ ]*\\x{{000A}}[ ]*', chr(10), 'g')
    ) AS text_clean
  FROM wrapped
)
SELECT doc_id,
       len(regexp_extract_all(t, '{_N_CTRL}'))::BIGINT AS n_ctrl,
       len(regexp_extract_all(t, '{_N_ZW}'))::BIGINT AS n_zero_width,
       len(regexp_extract_all(t, '{_N_ALT}'))::BIGINT AS n_alt_space,
       (text_clean != t) AS changed,
       text_clean,
       length(text_clean)::BIGINT AS n_chars_clean
FROM c ORDER BY doc_id
"""


def mojibake_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mojibake evidence counts (operators/normalize.py:mojibake_stats):
    every third document gets the classic UTF-8-as-cp1252 artifacts
    ("cafÃ©", "â€™") appended; the detector is a pure codegen regex
    count — the JVM-side gate that decides which rows the Python repair
    kernel touches."""
    _prep(spark)
    from energy_pandas_spark.operators.normalize import mojibake_stats

    docs = _t(spark, sf_dir, "documents")
    art = " cafÃ© â€™tis"  # 'café ’tis' corrupted
    wrapped = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.coalesce(F.col("text"), F.lit("")), F.lit(art)),
        )
        .otherwise(F.coalesce(F.col("text"), F.lit("")))
        .alias("text"),
    )
    return (
        mojibake_stats(wrapped)
        .select("doc_id", "n_mojibake", "n_chars", "mojibake_flag")
        .orderBy("doc_id")
    )


_MOJIBAKE_STATS_SQL = f"""
WITH wrapped AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN coalesce(text, '') || ' caf' || chr(195) || chr(169)
                   || ' ' || chr(226) || chr(8364) || chr(8482) || 'tis'
              ELSE coalesce(text, '') END AS t
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(t, '{_N_MOJI}'))::BIGINT AS n_mojibake,
       length(t)::BIGINT AS n_chars,
       (len(regexp_extract_all(t, '{_N_MOJI}')) > 0) AS mojibake_flag
FROM wrapped ORDER BY doc_id
"""


def fix_mojibake_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mojibake repair (operators/normalize.py:fix_mojibake): even
    doc_ids carry a UTF-8-decoded-as-cp1252 corruption of a known
    suffix, odd stay clean ASCII — so the repaired output is a closed
    form the oracle states directly. The marker gate is JVM-side; the
    Arrow kernel does per-char work only on the flagged half."""
    _prep(spark)
    from energy_pandas_spark.operators.normalize import fix_mojibake

    suffix = ": café — naïve ’done"
    corrupted = suffix.encode("utf-8").decode("cp1252")
    docs = _t(spark, sf_dir, "documents")
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.lit("Doc "),
            F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 2 == 0, F.lit(corrupted)).otherwise(
                F.lit(": plain ascii")
            ),
        ).alias("text"),
    )
    return fix_mojibake(wrapped).select("doc_id", "text").orderBy("doc_id")


_FIX_MOJIBAKE_SQL = """
SELECT doc_id,
       'Doc ' || doc_id::VARCHAR ||
       CASE WHEN doc_id % 2 = 0
            THEN ': caf' || chr(233) || ' ' || chr(8212) || ' na'
                 || chr(239) || 've ' || chr(8217) || 'done'
            ELSE ': plain ascii' END AS text
FROM documents ORDER BY doc_id
"""


def nfc_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization (operators/normalize.py:nfc_text):
    documents get a decomposed suffix (e+combining-acute, A+ring,
    dot-above+dot-below reorder case); the Arrow kernel's
    unicodedata.normalize must agree byte-for-byte with the oracle's
    utf8proc nfc_normalize on assigned codepoints."""
    _prep(spark)
    from energy_pandas_spark.operators.normalize import nfc_text

    suffix = " éÅḍ̇"
    docs = _t(spark, sf_dir, "documents")
    wrapped = docs.select(
        "doc_id",
        F.concat(F.coalesce(F.col("text"), F.lit("")), F.lit(suffix)).alias(
            "text"
        ),
    )
    return (
        nfc_text(wrapped, out_col="text_nfc", changed_col="changed")
        .select(
            "doc_id",
            "text_nfc",
            "changed",
            F.length("text_nfc").cast("long").alias("n_chars_nfc"),
        )
        .orderBy("doc_id")
    )


_NFC_SQL = """
WITH wrapped AS (
  SELECT doc_id,
         coalesce(text, '') || ' e' || chr(769) || 'A' || chr(778)
         || 'd' || chr(775) || chr(803) AS t
  FROM documents
)
SELECT doc_id,
       nfc_normalize(t) AS text_nfc,
       (nfc_normalize(t) != t) AS changed,
       length(nfc_normalize(t))::BIGINT AS n_chars_nfc
FROM wrapped ORDER BY doc_id
"""


def leakage_safe_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-aware splitting (operators/sampling.py:leakage_safe_split):
    documents are rewritten into 150 shared-content groups, then split
    80/10/10 by the hash of each group's REPRESENTATIVE (smallest
    member id) — so a content group can never straddle train/eval.
    n_groups summing to exactly 150 across splits IS the zero-leakage
    proof (plain hash_split would scatter every group). One digest
    aggregate + one digest equi-join; text never shuffles."""
    _prep(spark)
    from energy_pandas_spark.operators.sampling import leakage_safe_split

    docs = _t(spark, sf_dir, "documents")
    wrapped = docs.select(
        "doc_id",
        F.concat(
            F.lit("shared content "), (F.col("doc_id") % 150).cast("string")
        ).alias("text"),
    )
    out = leakage_safe_split(
        wrapped,
        "doc_id",
        splits={"train": 0.8, "val": 0.1, "test": 0.1},
        rep_col="rep",
    )
    return (
        out.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("id_sum"),
            F.countDistinct("rep").alias("n_groups"),
        )
        .orderBy("split")
    )


_LEAKAGE_SAFE_SPLIT_SQL = """
WITH w AS (
  SELECT doc_id, 'shared content ' || (doc_id % 150)::VARCHAR AS text
  FROM documents
), r AS (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS rep FROM w
), s AS (
  SELECT doc_id, rep,
         CASE WHEN b < 8000 THEN 'train'
              WHEN b < 9000 THEN 'val' ELSE 'test' END AS split
  FROM (
    SELECT doc_id, rep,
           (('0x' || substr(md5(rep::VARCHAR), 1, 15))::BIGINT % 10000)::INT
             AS b
    FROM r
  )
)
SELECT split, count(*) AS n_docs, sum(doc_id)::BIGINT AS id_sum,
       count(DISTINCT rep)::BIGINT AS n_groups
FROM s GROUP BY 1 ORDER BY 1
"""


def rrf_fuse_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (operators/retrieval.py:rrf_fuse): quantized
    TF-IDF top-10 and BM25 top-10 fused by reciprocal-rank fusion
    (integer 2^20 div (60+rank) contributions — order-free BIGINT
    sums), top-5 per query. RRF consumes only ranks, so the two
    systems' incomparable score scales never matter. Inherits BM25's
    1-ulp ln caveat through the bm25 ranking it fuses."""
    _prep(spark)
    from energy_pandas_spark.operators.retrieval import (
        bm25_topk,
        build_postings,
        query_terms,
        rrf_fuse,
        search_topk,
    )

    docs = _t(spark, sf_dir, "documents")
    q = query_terms(spark, _SEARCH_QUERIES)
    # ONE postings build persisted across both scorers — without this
    # each search re-tokenizes and re-aggregates the whole corpus
    # (measured 4.4s -> the sum of both standalone searches). The
    # cache materializes BEFORE the scorers compose: the fused lazy
    # plan reads it from several concurrent subtrees (both scorers'
    # matched joins + bm25's token-mass fold), and racing stages each
    # recomputed the corpus tokenize+aggregate (measured 8.6s vs 4.6s).
    # eager=False scorers share ONE matched-postings InMemoryRelation
    # (identical logical plans dedupe in the CacheManager) instead of
    # each building and releasing its own; the (queries x 5)-row fused
    # result materializes eagerly so every cache can be RELEASED
    # before returning — a leaked persist substitutes into later
    # same-plan queries via the logical-plan cache (observed breaking
    # an unrelated plan-lock test).
    from energy_pandas_spark.util import release_caches

    postings = build_postings(docs).persist()
    postings.count()
    tf_ranked = search_topk(docs, q, k=10, postings=postings, eager=False)
    bm_ranked = bm25_topk(docs, q, k=10, postings=postings, eager=False)
    fused = rrf_fuse([tf_ranked, bm_ranked], k=5)
    out = fused.orderBy("query_id", "rank").localCheckpoint(eager=True)
    release_caches(tf_ranked)
    release_caches(bm_ranked)
    postings.unpersist()
    return out


_RRF_FUSE_SQL = rf"""
WITH rtok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(coalesce(text, '')), '\s+'),
                            x -> x != '')) AS term
  FROM documents
), post AS (
  SELECT doc_id, term, count(*) AS tf, max(dl) AS dl FROM (
    SELECT doc_id, term, count(*) OVER (PARTITION BY doc_id) AS dl
    FROM rtok
  ) GROUP BY 1, 2
), q(query_id, term, qtf) AS (
  VALUES {_SEARCH_QUERY_VALUES}
), n AS (SELECT count(*) AS n_docs FROM documents),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT count(*) FROM rtok) AS total_tokens
), dfreq AS (
  SELECT term, count(*) AS df FROM post
  WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1
), tf_scored AS (
  SELECT q.query_id, p.doc_id,
         sum(p.tf * q.qtf * ((n.n_docs * 1024) // d.df))::BIGINT AS s
  FROM post p
  JOIN q ON q.term = p.term
  JOIN dfreq d ON d.term = p.term
  CROSS JOIN n
  GROUP BY 1, 2
), tf_ranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (
           PARTITION BY query_id ORDER BY s DESC, doc_id
         ) AS rank
  FROM tf_scored
), idf AS (
  SELECT d.term,
         ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5)) AS idf,
         s.total_tokens / s.n_docs AS avgdl
  FROM dfreq d CROSS JOIN stats s
), bm_scored AS (
  SELECT q.query_id, p.doc_id,
         sum(round(1024.0 * q.qtf * i.idf *
                   ((p.tf * 2.2) /
                    (p.tf + 1.2 * (0.25 + 0.75 * p.dl / i.avgdl))))::BIGINT
         )::BIGINT AS s
  FROM post p
  JOIN q ON q.term = p.term
  JOIN idf i ON i.term = p.term
  GROUP BY 1, 2
), bm_ranked AS (
  SELECT query_id, doc_id,
         row_number() OVER (
           PARTITION BY query_id ORDER BY s DESC, doc_id
         ) AS rank
  FROM bm_scored
), unioned AS (
  SELECT query_id, doc_id, rank FROM tf_ranked WHERE rank <= 10
  UNION ALL
  SELECT query_id, doc_id, rank FROM bm_ranked WHERE rank <= 10
), fused AS (
  SELECT query_id, doc_id,
         sum(1048576 // (60 + rank))::BIGINT AS score_q,
         count(*)::BIGINT AS n_systems
  FROM unioned GROUP BY 1, 2
), ranked AS (
  SELECT query_id, doc_id, score_q, n_systems,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score_q DESC, doc_id
         ) AS rank
  FROM fused
)
SELECT query_id::BIGINT AS query_id, doc_id, score_q, n_systems,
       rank::INT AS rank
FROM ranked WHERE rank <= 5
ORDER BY query_id, rank
"""


def anchor_texts_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text harvesting + per-target anchor profile
    (operators/urls.py:extract_anchor_texts/anchor_text_summary) over
    synthetic pages: each document links one of 20 targets with a
    markup-bearing anchor, a single-quoted tracking-param variant of
    the SAME target (canonicalization must pool them), and an
    image-only anchor that must drop as NULL. Extraction is a map-only
    regex explode; the profile is one (url, anchor) aggregate + the
    bounded two-stage top-k — never a whole-URL window task."""
    _prep(spark)
    from energy_pandas_spark.operators.urls import (
        anchor_text_summary,
        extract_anchor_texts,
    )

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    tgt = F.concat(
        F.lit("https://t"), (did % 20).cast("string"), F.lit(".net/page")
    )
    html = F.concat(
        F.lit("<p>"),
        F.coalesce(F.col("text"), F.lit("")),
        F.lit('</p><a href="'),
        tgt,
        F.lit('">visit <b>site</b> v'),
        (did % 3).cast("string"),
        F.lit("</a><a href='"),
        tgt,
        F.lit("?utm_source=x' class='x'>alt name</a>"),
        F.lit('<a href="'),
        tgt,
        F.lit('"><img src="i.png"></a>'),
    )
    pages = docs.select("doc_id", html.alias("text"))
    return anchor_text_summary(extract_anchor_texts(pages), k=2).orderBy(
        "url"
    )


_ANCHOR_DQ_SQL = r'(?is)<a\b[^>]*href\s*=\s*"([^"]*)"[^>]*>(.*?)</a\s*>'
_ANCHOR_SQ_SQL = r"(?is)<a\b[^>]*href\s*=\s*'([^']*)'[^>]*>(.*?)</a\s*>"

_ANCHOR_TEXTS_SQL = rf"""
WITH pages AS (
  SELECT doc_id,
         '<p>' || coalesce(text, '')
         || '</p><a href="https://t' || (doc_id % 20)::VARCHAR
         || '.net/page">visit <b>site</b> v' || (doc_id % 3)::VARCHAR
         || '</a><a href=''https://t' || (doc_id % 20)::VARCHAR
         || '.net/page?utm_source=x'' class=''x''>alt name</a>'
         || '<a href="https://t' || (doc_id % 20)::VARCHAR
         || '.net/page"><img src="i.png"></a>' AS t
  FROM documents
), raw AS (
  SELECT unnest(regexp_extract_all(t, '{_ANCHOR_DQ_SQL}', 1)
                || regexp_extract_all(t, $${_ANCHOR_SQ_SQL}$$, 1)) AS href,
         unnest(regexp_extract_all(t, '{_ANCHOR_DQ_SQL}', 2)
                || regexp_extract_all(t, $${_ANCHOR_SQ_SQL}$$, 2)) AS markup
  FROM pages
), u AS (
  SELECT href AS url,
         trim(regexp_replace(regexp_replace(markup, '<[^>]*>', ' ', 'g'),
                             '\s+', ' ', 'g')) AS anchor
  FROM raw
), sa AS ({_CANON_URL_CTE}
), counts AS (
  SELECT canonical_url AS url, anchor, count(*) AS n
  FROM c WHERE canonical_url IS NOT NULL AND anchor != ''
  GROUP BY 1, 2
), ranked AS (
  SELECT url, anchor, n,
         row_number() OVER (
           PARTITION BY url ORDER BY n DESC, anchor
         ) AS r
  FROM counts
), top AS (
  SELECT url, string_agg(anchor, ' | ' ORDER BY r) AS top_anchors
  FROM ranked WHERE r <= 2 GROUP BY 1
), tot AS (
  SELECT url, sum(n)::BIGINT AS n_links,
         count(*)::BIGINT AS n_unique_anchors
  FROM counts GROUP BY 1
)
SELECT tot.url, tot.n_links, tot.n_unique_anchors, top.top_anchors
FROM tot JOIN top USING (url) ORDER BY url
"""


def _with_block_html(docs):
    """Deterministic jusText test page per document: a link-only nav
    (boilerplate), a heading (short), a fixed stopword-rich paragraph
    (good), the document's own text as a paragraph (label depends on
    its content — deterministic either way), and a link footer."""
    return docs.select(
        "doc_id",
        F.concat(
            F.lit('<nav><a href="/">Home page</a> <a href="/x">About the site</a></nav>'),
            F.lit("<h1>Doc "),
            F.col("doc_id").cast("string"),
            F.lit("</h1><p>It is the case that a good result of the work "
                  "is in the text and that it is for a test.</p><p>"),
            F.coalesce(F.col("text"), F.lit("")),
            F.lit('</p><div><a href="/tos">Terms of use</a></div>'),
        ).alias("text"),
    )


def content_blocks_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jusText-style block scoring (operators/extraction.py:
    content_blocks) over synthetic pages: split at block tags, score
    every block on link density / stopword density / length as
    integer per-milles, label boilerplate/short/good/low_text. One
    map-only codegen projection + posexplode — zero shuffle, no
    Python; the oracle replays the literal same regex + HOF chain."""
    _prep(spark)
    from energy_pandas_spark.operators.extraction import content_blocks

    docs = _t(spark, sf_dir, "documents")
    return content_blocks(_with_block_html(docs)).orderBy(
        "doc_id", "block_idx"
    )


def main_content_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-content extraction (operators/extraction.py:
    extract_main_content): the good blocks re-joined in document order
    WITHOUT exploding — the page stays one row end to end (zero
    shuffle), nav/footer boilerplate and the heading vanish."""
    _prep(spark)
    from energy_pandas_spark.operators.extraction import extract_main_content

    docs = _t(spark, sf_dir, "documents")
    return (
        extract_main_content(_with_block_html(docs))
        .select(
            "doc_id",
            "main_content",
            F.length("main_content").cast("long").alias("n_chars_main"),
        )
        .orderBy("doc_id")
    )


_BLOCK_PAGE_CTE = """
  SELECT doc_id,
         '<nav><a href="/">Home page</a> <a href="/x">About the site</a></nav>'
         || '<h1>Doc ' || doc_id::VARCHAR
         || '</h1><p>It is the case that a good result of the work '
         || 'is in the text and that it is for a test.</p><p>'
         || coalesce(text, '')
         || '</p><div><a href="/tos">Terms of use</a></div>' AS h
  FROM documents
"""

_BLOCK_SPLIT_SQL = (
    r"(?i)</?(?:p|div|br|li|ul|ol|tr|td|th|table|h[1-6]|blockquote"
    r"|section|article|header|footer|nav|aside|main|form)\b[^>]*>"
)
_ANCHOR_INNER_SQL = r"(?is)<a\b[^>]*>(.*?)</a\s*>"
_BLOCK_STOPLIST_SQL = (
    "['a','and','be','for','have','in','is','it','of','that',"
    "'the','to','with']"
)


def _clean_block_sql(e: str) -> str:
    """DuckDB twin of operators/extraction.py:_clean for expression
    ``e`` (tag strip, entity decode in the same order — &amp; last —
    whitespace collapse, trim)."""
    t = f"regexp_replace({e}, '(?s)<[^>]*>', ' ', 'g')"
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "''"),
        ("&nbsp;", " "),
        ("&amp;", "&"),
    ):
        t = f"replace({t}, '{ent}', '{ch}')"
    return f"trim(regexp_replace({t}, '\\s+', ' ', 'g'))"


_BLOCK_STATS_CTE = rf"""
), pre AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(regexp_replace(h,
      '(?is)<script\b.*?</script\s*>', ' ', 'g'),
      '(?is)<style\b.*?</style\s*>', ' ', 'g'),
      '(?s)<!--.*?-->', ' ', 'g') AS h
  FROM pages
), raw AS (
  SELECT doc_id,
         unnest(string_split_regex(h, '{_BLOCK_SPLIT_SQL}')) AS b,
         generate_subscripts(string_split_regex(h, '{_BLOCK_SPLIT_SQL}'), 1)
           AS ord0
  FROM pre
), scored0 AS (
  SELECT doc_id, ord0, b,
         {_clean_block_sql('b')} AS text,
         coalesce(list_sum(list_transform(
           regexp_extract_all(b, '{_ANCHOR_INNER_SQL}', 1),
           x -> length({_clean_block_sql('x')})
         )), 0)::BIGINT AS n_link_chars
  FROM raw
), scored AS (
  SELECT doc_id, ord0, text, n_link_chars,
         length(text)::BIGINT AS n_chars,
         len(list_filter(string_split(lower(text), ' '), x -> x != ''))
           ::BIGINT AS n_words,
         len(list_filter(
           list_filter(string_split(lower(text), ' '), x -> x != ''),
           x -> list_contains({_BLOCK_STOPLIST_SQL}, x)))::BIGINT AS n_stop
  FROM scored0 WHERE text != ''
), labeled AS (
  SELECT doc_id, ord0, text, n_chars, n_words, n_link_chars,
         (n_link_chars * 1000) // greatest(n_chars, 1) AS link_permille,
         (n_stop * 1000) // greatest(n_words, 1) AS stop_permille
  FROM scored
), blocks AS (
  SELECT doc_id,
         (row_number() OVER (PARTITION BY doc_id ORDER BY ord0) - 1)::INT
           AS block_idx,
         text AS block_text, n_chars, n_words, n_link_chars,
         link_permille, stop_permille,
         CASE WHEN link_permille > 330 THEN 'boilerplate'
              WHEN n_words < 5 THEN 'short'
              WHEN stop_permille >= 150 THEN 'good'
              ELSE 'low_text' END AS label
  FROM labeled
"""

_CONTENT_BLOCKS_SQL = f"""
WITH pages AS ({_BLOCK_PAGE_CTE}{_BLOCK_STATS_CTE}
)
SELECT doc_id, block_idx, block_text, n_chars, n_words, n_link_chars,
       link_permille, stop_permille, label
FROM blocks ORDER BY doc_id, block_idx
"""

_MAIN_CONTENT_SQL = f"""
WITH pages AS ({_BLOCK_PAGE_CTE}{_BLOCK_STATS_CTE}
), joined AS (
  SELECT p.doc_id,
         coalesce(string_agg(b.block_text, chr(10) ORDER BY b.block_idx)
                  FILTER (WHERE b.label = 'good'), '') AS main_content
  FROM pages p LEFT JOIN blocks b ON b.doc_id = p.doc_id
  GROUP BY p.doc_id
)
SELECT doc_id, main_content,
       length(main_content)::BIGINT AS n_chars_main
FROM joined ORDER BY doc_id
"""


def _with_templated_text(docs):
    """Per-source template header/footer around every document — the
    per-site boilerplate the template scrub must detect and strip
    while leaving the (per-doc unique) body lines alone."""
    return docs.select(
        "doc_id",
        "source",
        F.concat(
            F.lit("Copyright "),
            F.col("source"),
            F.lit(" press\n"),
            F.coalesce(F.col("text"), F.lit("")),
            F.lit("\nAbout "),
            F.col("source"),
            F.lit(" | contact"),
        ).alias("text"),
    )


def domain_templates_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-site template-line detection (operators/text.py:
    template_lines): a normalized line in >= 500 permille of a
    source's documents (and >= 2 of them) is that site's boilerplate.
    Per-document distinct lines materialize in-array BEFORE the
    explode (no distinct shuffle); one map-combined (group, line)
    aggregate + the group-keyed doc-count join."""
    _prep(spark)
    from energy_pandas_spark.operators.text import template_lines

    docs = _t(spark, sf_dir, "documents")
    return template_lines(_with_templated_text(docs), "source").orderBy(
        "source", "line"
    )


_DOMAIN_TEMPLATES_SQL = r"""
WITH w AS (
  SELECT doc_id, source,
         'Copyright ' || source || ' press' || chr(10)
         || coalesce(text, '') || chr(10)
         || 'About ' || source || ' | contact' AS t
  FROM documents
), dl AS (
  SELECT DISTINCT source, doc_id, line FROM (
    SELECT source, doc_id,
           trim(regexp_replace(lower(unnest(string_split(t, chr(10)))),
                               '\s+', ' ', 'g')) AS line
    FROM w
  ) WHERE line != ''
), c AS (
  SELECT source, line, count(*) AS n_docs_with_line FROM dl GROUP BY 1, 2
), g AS (
  SELECT source, count(*) AS n_docs_group FROM w GROUP BY 1
)
SELECT c.source, c.line, c.n_docs_with_line, g.n_docs_group,
       (c.n_docs_with_line * 1000) // g.n_docs_group AS doc_permille
FROM c JOIN g USING (source)
WHERE c.n_docs_with_line * 1000 >= 500 * g.n_docs_group
  AND c.n_docs_with_line >= 2
ORDER BY source, line
"""


def strip_templates_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-site template stripping (operators/text.py:strip_templates):
    the injected Copyright/About lines vanish from every document of
    their source, body lines survive with original casing, and the
    text rebuilds in line order. One text scan into persisted line
    rows (digest-long shuffles only), a (group, digest) anti-join, the
    per-doc array_sort rebuild — never a global sort."""
    _prep(spark)
    from energy_pandas_spark.operators.text import strip_templates

    docs = _t(spark, sf_dir, "documents")
    return (
        strip_templates(_with_templated_text(docs), "source")
        .select("doc_id", "source", "text", "n_lines_kept")
        .orderBy("doc_id")
    )


_STRIP_TEMPLATES_SQL = r"""
WITH w AS (
  SELECT doc_id, source,
         'Copyright ' || source || ' press' || chr(10)
         || coalesce(text, '') || chr(10)
         || 'About ' || source || ' | contact' AS t
  FROM documents
), rows0 AS (
  SELECT source, doc_id,
         generate_subscripts(string_split(t, chr(10)), 1) AS idx,
         unnest(string_split(t, chr(10))) AS line
  FROM w
), keyed AS (
  SELECT *, trim(regexp_replace(lower(line), '\s+', ' ', 'g')) AS k
  FROM rows0
), dl AS (
  SELECT DISTINCT source, doc_id, k FROM keyed WHERE k != ''
), c AS (
  SELECT source, k, count(*) AS n FROM dl GROUP BY 1, 2
), g AS (
  SELECT source, count(*) AS gn FROM w GROUP BY 1
), tmpl AS (
  SELECT c.source, c.k FROM c JOIN g USING (source)
  WHERE c.n * 1000 >= 500 * g.gn AND c.n >= 2
), kept AS (
  SELECT keyed.doc_id,
         string_agg(keyed.line, chr(10) ORDER BY keyed.idx) AS text,
         count(*) AS n_lines_kept
  FROM keyed
  LEFT JOIN tmpl ON tmpl.source = keyed.source AND tmpl.k = keyed.k
  WHERE tmpl.k IS NULL
  GROUP BY 1
)
SELECT w.doc_id, w.source,
       coalesce(kept.text, '') AS text,
       coalesce(kept.n_lines_kept, 0)::BIGINT AS n_lines_kept
FROM w LEFT JOIN kept USING (doc_id) ORDER BY doc_id
"""


def kn3_lm_score_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney TRIGRAM log-likelihood (operators/
    text.py:kneser_ney_trigram_score): the KenLM-order-3 depth of the
    bigram scorer, every model table derived from ONE trigram count
    aggregate over the src0 slice; unseen trigram contexts back off to
    the continuation bigram, unseen w2 to the continuation unigram,
    zero-mass w3 positions are OOV (counted, never scored). Order-free
    BIGINT sums of 1/2^20-nat quantized logs; 1-ulp libm ln caveat."""
    _prep(spark)
    from energy_pandas_spark.operators.text import (
        kneser_ney_trigram_score,
        trigram_lm_train,
    )

    docs = _t(spark, sf_dir, "documents")
    lm = trigram_lm_train(docs.filter(F.col("source") == "src0"))
    return kneser_ney_trigram_score(docs, lm).orderBy("doc_id")


_KN3_LM_SCORE_SQL = r"""
WITH toks AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x != '') AS t
  FROM documents
),
tg AS (
  SELECT doc_id, source, t[i] AS w1, t[i + 1] AS w2, t[i + 2] AS w3
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 1)) AS i)
),
lm AS (
  SELECT w1, w2, w3, count(*) AS c123 FROM tg WHERE source = 'src0'
  GROUP BY 1, 2, 3
),
ctx3 AS (
  SELECT w1, w2, sum(c123)::BIGINT AS c12, count(*)::BIGINT AS n3t
  FROM lm GROUP BY 1, 2
),
nc23 AS (
  SELECT w2, w3, count(*)::BIGINT AS nc23 FROM lm GROUP BY 1, 2
),
ctx2 AS (
  SELECT w2, sum(nc23)::BIGINT AS den2, count(*)::BIGINT AS n2t
  FROM nc23 GROUP BY 1
),
cont1 AS (SELECT w3, count(*)::BIGINT AS nc3 FROM nc23 GROUP BY 1),
b AS (SELECT count(*)::BIGINT AS b FROM nc23),
sc AS (
  SELECT g.doc_id,
         CASE WHEN coalesce(u.nc3, 0) = 0 THEN 1 ELSE 0 END AS oov,
         CASE WHEN coalesce(u.nc3, 0) = 0 THEN 0
              ELSE round(ln(
                CASE WHEN c3.c12 IS NOT NULL THEN
                  greatest(4 * coalesce(l.c123, 0) - 3, 0)::DOUBLE
                    / (4 * c3.c12)::DOUBLE
                  + ((3 * c3.n3t)::DOUBLE / (4 * c3.c12)::DOUBLE)
                    * (CASE WHEN c2.den2 IS NOT NULL THEN
                         greatest(4 * coalesce(n.nc23, 0) - 3, 0)::DOUBLE
                           / (4 * c2.den2)::DOUBLE
                         + ((3 * c2.n2t)::DOUBLE / (4 * c2.den2)::DOUBLE)
                           * (u.nc3::DOUBLE / b.b::DOUBLE)
                       ELSE u.nc3::DOUBLE / b.b::DOUBLE END)
                ELSE
                  CASE WHEN c2.den2 IS NOT NULL THEN
                    greatest(4 * coalesce(n.nc23, 0) - 3, 0)::DOUBLE
                      / (4 * c2.den2)::DOUBLE
                    + ((3 * c2.n2t)::DOUBLE / (4 * c2.den2)::DOUBLE)
                      * (u.nc3::DOUBLE / b.b::DOUBLE)
                  ELSE u.nc3::DOUBLE / b.b::DOUBLE END
                END
              ) * 1048576.0)::BIGINT END AS lpq
  FROM tg g
  LEFT JOIN lm l ON g.w1 = l.w1 AND g.w2 = l.w2 AND g.w3 = l.w3
  LEFT JOIN ctx3 c3 ON g.w1 = c3.w1 AND g.w2 = c3.w2
  LEFT JOIN nc23 n ON g.w2 = n.w2 AND g.w3 = n.w3
  LEFT JOIN ctx2 c2 ON g.w2 = c2.w2
  LEFT JOIN cont1 u ON g.w3 = u.w3
  CROSS JOIN b
),
per AS (
  SELECT doc_id, count(*)::BIGINT AS n_trigrams, sum(oov)::BIGINT AS n_oov,
         sum(lpq)::BIGINT AS logprob_q
  FROM sc GROUP BY 1
)
SELECT d.doc_id,
       coalesce(per.n_trigrams, 0)::BIGINT AS n_trigrams,
       coalesce(per.n_oov, 0)::BIGINT AS n_oov,
       coalesce(per.logprob_q, 0)::BIGINT AS logprob_q
FROM documents d LEFT JOIN per USING (doc_id)
ORDER BY d.doc_id
"""


def selection_curve_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-vs-quantity curve (operators/sampling.py:
    selection_curve): documents binned by n_chars over [0, 4000) with
    token mass as the weight — per-bin counts plus the
    cumulative-from-above retention a filter at each threshold keeps.
    One map-combined histogram aggregate; the cumulative window runs
    over the n_bins-row BIN table (bounded by construction, never by
    data)."""
    _prep(spark)
    from energy_pandas_spark.functions.textfns import tokens
    from energy_pandas_spark.operators.sampling import selection_curve

    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.size(tokens("text")).cast("long").alias("toks"),
    )
    return selection_curve(
        scored, "n_chars", lo=0, hi=4000, weight_col="toks", n_bins=8
    )


_SELECTION_CURVE_SQL = r"""
WITH d AS (
  SELECT doc_id, n_chars,
         len(list_filter(string_split_regex(lower(coalesce(text, '')),
                                            '\s+'),
                         x -> x != ''))::BIGINT AS toks
  FROM documents
), h AS (
  SELECT least(greatest((n_chars * 8) // 4000, 0), 7)::INT AS bin,
         count(*) AS n_docs, sum(toks)::BIGINT AS weight
  FROM d WHERE n_chars IS NOT NULL GROUP BY 1
), bins AS (
  SELECT i::INT AS bin, ((i * 4000 + 7) // 8)::BIGINT AS threshold
  FROM range(8) t(i)
), f AS (
  SELECT b.bin, b.threshold,
         coalesce(h.n_docs, 0)::BIGINT AS n_docs,
         coalesce(h.weight, 0)::BIGINT AS weight
  FROM bins b LEFT JOIN h USING (bin)
), c AS (
  SELECT *,
         sum(n_docs) OVER (ORDER BY bin DESC)::BIGINT
           AS n_docs_at_or_above,
         sum(weight) OVER (ORDER BY bin DESC)::BIGINT
           AS weight_at_or_above,
         sum(weight) OVER ()::BIGINT AS tot
  FROM f
)
SELECT bin, threshold, n_docs, weight, n_docs_at_or_above,
       weight_at_or_above,
       (weight_at_or_above * 1000) // greatest(tot, 1)
         AS weight_permille_retained
FROM c ORDER BY bin
"""


def web_corpus_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The session-10 crawl chain COMPOSED, oracle-checked end to end:
    Unicode hygiene (tab/NBSP/CRLF dirt folds) -> jusText block
    extraction (nav/footer/heading drop, per-block scoring on the
    CLEANED page) -> per-site template strip (the per-source copyright
    line vanishes; the per-doc good sentence survives) -> one-row
    corpus report. Every stage verifies in isolation elsewhere; this
    query verifies their COMPOSITION, where stage-boundary bugs
    (normalization drift, schema loss, order dependence) hide."""
    _prep(spark)
    from energy_pandas_spark.functions.textfns import tokens
    from energy_pandas_spark.operators.extraction import extract_main_content
    from energy_pandas_spark.operators.normalize import clean_text
    from energy_pandas_spark.operators.text import strip_templates

    docs = _t(spark, sf_dir, "documents")
    page = F.concat(
        F.lit('<nav><a href="/">Home of the site</a> '
              '<a href="/a">All the pages</a></nav><h1>Doc '),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>\t It is the case that a good result of the "
              "work is in the text and\r\nthat it is for a test of doc "),
        F.col("doc_id").cast("string"),
        F.lit(".</p><p>The copyright of "),
        F.col("source"),
        F.lit(" is with the owner of the site.</p><p>"),
        F.coalesce(F.col("text"), F.lit("")),
        F.lit('</p><footer><a href="/t">Terms of use here</a></footer>'),
    )
    raw = docs.select("doc_id", "source", page.alias("text"))
    cleaned = clean_text(raw)
    main = extract_main_content(cleaned, out_col="__main").select(
        "doc_id", "source", F.col("__main").alias("text")
    )
    stripped = strip_templates(main, "source")
    return stripped.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.trim("text") != "").alias("n_nonempty"),
        F.sum(
            F.when(F.trim("text") != "", F.col("doc_id")).otherwise(0)
        ).alias("id_sum_nonempty"),
        F.sum(F.length("text")).alias("total_chars"),
        F.sum(F.size(tokens("text"))).cast("long").alias("total_tokens"),
    )


def _hygiene_sql(e: str) -> str:
    """DuckDB twin of operators/normalize.py:cleaned_text for
    expression ``e`` (the literal shared regex constants)."""
    return f"""trim(
      regexp_replace(
      regexp_replace(
      regexp_replace(
      regexp_replace(
      regexp_replace(
      regexp_replace({e},
        '\\x{{000D}}\\x{{000A}}?', chr(10), 'g'),
        '{_N_CTRL}', '', 'g'),
        '{_N_ZW}', '', 'g'),
        '{_N_ALT}', ' ', 'g'),
        '[ \\x{{0009}}]+', ' ', 'g'),
        '[ ]*\\x{{000A}}[ ]*', chr(10), 'g'))"""


_WEB_CORPUS_SQL = rf"""
WITH raw0 AS (
  SELECT doc_id, source,
         '<nav><a href="/">Home of the site</a> '
         || '<a href="/a">All the pages</a></nav><h1>Doc '
         || doc_id::VARCHAR
         || '</h1><p>' || chr(9) || chr(160)
         || 'It is the case that a good result of the work is in the '
         || 'text and' || chr(13) || chr(10)
         || 'that it is for a test of doc ' || doc_id::VARCHAR
         || '.</p><p>The copyright of ' || source
         || ' is with the owner of the site.</p><p>'
         || coalesce(text, '')
         || '</p><footer><a href="/t">Terms of use here</a></footer>'
           AS t0
  FROM documents
), pages AS (
  SELECT doc_id, {_hygiene_sql('t0')} AS h FROM raw0{_BLOCK_STATS_CTE}
), mainc AS (
  SELECT p.doc_id,
         coalesce(string_agg(b.block_text, chr(10) ORDER BY b.block_idx)
                  FILTER (WHERE b.label = 'good'), '') AS text
  FROM pages p LEFT JOIN blocks b ON b.doc_id = p.doc_id
  GROUP BY 1
), m2 AS (
  SELECT m.doc_id, d.source, m.text
  FROM mainc m JOIN documents d USING (doc_id)
), rows0 AS (
  SELECT source, doc_id,
         generate_subscripts(string_split(text, chr(10)), 1) AS idx,
         unnest(string_split(text, chr(10))) AS line
  FROM m2
), keyed AS (
  SELECT *, trim(regexp_replace(lower(line), '\s+', ' ', 'g')) AS k
  FROM rows0
), dl AS (
  SELECT DISTINCT source, doc_id, k FROM keyed WHERE k != ''
), c AS (
  SELECT source, k, count(*) AS n FROM dl GROUP BY 1, 2
), g AS (
  SELECT source, count(*) AS gn FROM m2 GROUP BY 1
), tmpl AS (
  SELECT c.source, c.k FROM c JOIN g USING (source)
  WHERE c.n * 1000 >= 500 * g.gn AND c.n >= 2
), kept AS (
  SELECT keyed.doc_id,
         string_agg(keyed.line, chr(10) ORDER BY keyed.idx) AS text
  FROM keyed
  LEFT JOIN tmpl ON tmpl.source = keyed.source AND tmpl.k = keyed.k
  WHERE tmpl.k IS NULL
  GROUP BY 1
), final AS (
  SELECT m2.doc_id, coalesce(kept.text, '') AS text
  FROM m2 LEFT JOIN kept USING (doc_id)
)
SELECT count(*)::BIGINT AS n_docs,
       count(*) FILTER (WHERE trim(text) != '')::BIGINT AS n_nonempty,
       sum(CASE WHEN trim(text) != '' THEN doc_id ELSE 0 END)::BIGINT
         AS id_sum_nonempty,
       sum(length(text))::BIGINT AS total_chars,
       sum(len(list_filter(string_split_regex(lower(text), '\s+'),
                           x -> x != '')))::BIGINT AS total_tokens
FROM final
"""


def langid_ngram_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cavnar-Trenkle char-trigram language ID (operators/text.py:
    train_langid_profiles/langid_ngram): ranked top-200 n-gram
    profiles per corpus language, out-of-place distance with a
    200-rank miss penalty, argmin with lang-asc tiebreak — integer
    rank arithmetic end to end, so the confusion matrix is
    hash-gated. One broadcast join against the langs x 200 profile
    table; per-doc ranking uses the bounded two-stage top-k.
    Self-train composition (langid_ngram_selftrain): the char-gram
    explode — the dominant cost — runs ONCE and feeds both the
    language profiles and the per-doc profiles off one persisted
    count table (VERDICT r3 #6; the train+score composition
    tokenized the corpus twice); the single-file scan spreads
    across all cores before the explode."""
    _prep(spark)
    from energy_pandas_spark.operators.text import langid_ngram_selftrain
    from energy_pandas_spark.util import spread_partitions

    docs = spread_partitions(_t(spark, sf_dir, "documents"))
    pred = langid_ngram_selftrain(docs)
    return (
        pred.groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "lang_pred")
    )


_LANGID_NGRAM_SQL = r"""
WITH nt AS (
  SELECT doc_id, lang,
         trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g'))
           AS t
  FROM documents
), g AS (
  SELECT doc_id, lang, substr(t, i, 3) AS gram
  FROM nt, LATERAL (SELECT unnest(range(1, length(t) - 1)) AS i)
), lc AS (
  SELECT lang, gram, count(*) AS c FROM g GROUP BY 1, 2
), lp AS (
  SELECT lang, gram,
         row_number() OVER (PARTITION BY lang ORDER BY c DESC, gram)
           AS rank
  FROM lc QUALIFY rank <= 200
), dc AS (
  SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2
), dp AS (
  SELECT doc_id, gram,
         row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, gram)
           AS drank
  FROM dc QUALIFY drank <= 200
), j AS (
  SELECT d.doc_id, lp.lang, abs(d.drank - lp.rank) AS dd
  FROM dp d JOIN lp ON lp.gram = d.gram
), agg AS (
  SELECT doc_id, lang, sum(dd) AS dsum, count(*) AS nhits
  FROM j GROUP BY 1, 2
), tot AS (
  SELECT doc_id, count(*) AS ng FROM dp GROUP BY 1
), sc AS (
  SELECT a.doc_id, a.lang,
         (a.dsum + (t.ng - a.nhits) * 200)::BIGINT AS dist
  FROM agg a JOIN tot t USING (doc_id)
), best AS (
  SELECT doc_id, lang AS pred
  FROM sc QUALIFY row_number() OVER (
    PARTITION BY doc_id ORDER BY dist, lang
  ) = 1
), p AS (
  SELECT d.lang, coalesce(b.pred, 'und') AS lang_pred
  FROM documents d LEFT JOIN best b USING (doc_id)
)
SELECT lang, lang_pred, count(*)::BIGINT AS n_docs
FROM p GROUP BY 1, 2 ORDER BY 1, 2
"""


_MIX_WEIGHTS = {f"src{i}": (900 if i == 0 else 50) for i in range(20)}


def mixture_plan_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling mixture solver (operators/sampling.py:
    mixture_plan): src0 carries an 18x weight against a 20k-token
    budget at <=1.5 epochs, so it clamps to its cap and the deficit
    redistributes over the other nineteen sources — the integer
    cross-multiplication clamp test over prefix sums, exact on both
    engines (the double cap/w ratio orders only). Windows run over
    the 20-row source table."""
    _prep(spark)
    from energy_pandas_spark.functions.textfns import tokens
    from energy_pandas_spark.operators.sampling import mixture_plan

    docs = _t(spark, sf_dir, "documents")
    counts = (
        docs.select("source", F.size(tokens("text")).cast("long").alias("__t"))
        .groupBy("source")
        .agg(F.sum("__t").alias("n_tokens"))
    )
    return mixture_plan(
        counts, budget=20_000, weights=_MIX_WEIGHTS, max_rate_permille=1500
    ).orderBy("source")


_MIX_WEIGHT_VALUES = ", ".join(
    f"('src{i}', {900 if i == 0 else 50})" for i in range(20)
)

_MIXTURE_PLAN_SQL = rf"""
WITH tok AS (
  SELECT source,
         len(list_filter(string_split_regex(lower(coalesce(text, '')),
                                            '\s+'),
                         x -> x != ''))::BIGINT AS nt
  FROM documents
), cnt AS (
  SELECT source, sum(nt)::BIGINT AS n_tokens FROM tok GROUP BY 1
), w(source, w) AS (
  VALUES {_MIX_WEIGHT_VALUES}
), base AS (
  SELECT c.source, c.n_tokens, w.w,
         ((c.n_tokens * 1500) // 1000)::BIGINT AS cap
  FROM cnt c JOIN w USING (source)
), staged AS (
  SELECT *,
         coalesce(sum(cap) OVER (
           ORDER BY cap::DOUBLE / w::DOUBLE, source
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumcap,
         coalesce(sum(w) OVER (
           ORDER BY cap::DOUBLE / w::DOUBLE, source
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumw,
         sum(w) OVER () AS wtot
  FROM base
), c2 AS (
  SELECT *,
         (cap * (wtot - cumw) < w * (20000 - cumcap)) AS clamped
  FROM staged
), rem AS (
  SELECT coalesce(sum(CASE WHEN clamped THEN cap END), 0) AS capsum,
         coalesce(sum(CASE WHEN NOT clamped THEN w END), 0) AS wrem
  FROM c2
), takes AS (
  SELECT c2.source, c2.n_tokens, c2.cap, c2.clamped,
         least(CASE WHEN c2.clamped THEN c2.cap
                    ELSE (c2.w * (20000 - rem.capsum))
                         // greatest(rem.wrem, 1) END,
               c2.cap)::BIGINT AS take
  FROM c2 CROSS JOIN rem
)
SELECT source, n_tokens, cap, take, clamped,
       ((take * 10000) // greatest(n_tokens, 1))::BIGINT AS rate_bp
FROM takes ORDER BY source
"""


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001 (driver smoke check)."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS: the driver hash-checks the first ~50 entries per
    # round, so registry order IS the verification-rotation policy
    # (scripts/rotation_report.py; enforced by tests/test_rotation.py).
    # Round-8 window (VERDICT r7 #2): ORACLE-BACKED slots only — the
    # production driver has no rows-only check path, so the 13
    # rows-only queries headed in r7 came back err=no_oracle with zero
    # evidence (their correctness pin stays the local suite; SURVEY
    # §8). Head = 6 permanent §2 canaries, then the stalest
    # oracle-backed greens (the 11 r2 greens the r7 window could not
    # fit, then the r3 block). Tail = remaining greens, oldest check
    # first (the local pytest gate still runs every entry every time).
    return {
        # -- §2 reference-parity canaries (permanent head) --
        "with_timeindex": with_timeindex,
        "reportdata_series": reportdata_series,
        "to_units_kelvin": to_units_kelvin,
        "ldc": ldc,
        "series_align_arithmetic": series_align_arithmetic,
        "reportdata_pivot": reportdata_pivot,
        # -- stalest oracle-backed greens fill the window to 50 --
        "incremental_dedup_docs": incremental_dedup_docs,
        "fuzzy_pairs_prefix": fuzzy_pairs_prefix,
        "minhash_pairs": minhash_pairs,
        "rollup_sales": rollup_sales,
        "ntile_quartiles": ntile_quartiles,
        "corpus_cardinality": corpus_cardinality,
        "cosine_topk": cosine_topk,
        "embedding_norms": embedding_norms,
        "tfidf_top3": tfidf_top3,
        "ngram_top100": ngram_top100,
        "redact_pii_docs": redact_pii_docs,
        "benchmark_contamination": benchmark_contamination,
        "q4_late_orders": q4_late_orders,
        "doc_repetition": doc_repetition,
        "pack_sequences_docs": pack_sequences_docs,
        "q13_order_distribution": q13_order_distribution,
        "q19_disjunctive_revenue": q19_disjunctive_revenue,
        "melt_lineitem_measures": melt_lineitem_measures,
        "quantize_embeddings": quantize_embeddings,
        "q18_large_volume": q18_large_volume,
        "degree_days_daily": degree_days_daily,
        "ewma_final_per_user": ewma_final_per_user,
        "twa_per_user": twa_per_user,
        "url_stats_docs": url_stats_docs,
        "clean_corpus_docs": clean_corpus_docs,
        "q7_volume_shipping": q7_volume_shipping,
        "q8_market_share": q8_market_share,
        "q9_product_profit": q9_product_profit,
        "q14_promo_revenue": q14_promo_revenue,
        "q15_top_supplier": q15_top_supplier,
        "q17_small_quantity_revenue": q17_small_quantity_revenue,
        "q21_suppliers_kept_waiting": q21_suppliers_kept_waiting,
        "q22_sales_opportunity": q22_sales_opportunity,
        "q2_min_cost_supplier": q2_min_cost_supplier,
        "q11_important_stock": q11_important_stock,
        "q12_late_lines_by_status": q12_late_lines_by_status,
        "q16_supplier_count": q16_supplier_count,
        "q20_excess_shippers": q20_excess_shippers,
        "semdedup_pairs": semdedup_pairs,
        "semdedup_keep": semdedup_keep,
        "doc_classifier_score": doc_classifier_score,
        "doc_lm_score": doc_lm_score,
        "value_trend_by_type": value_trend_by_type,
        "robust_scale_by_type": robust_scale_by_type,
        # -- driver window ends here; tail rotates up next round --
        "pq_topk_embeddings": pq_topk_embeddings,
        "doc_classifier_trained": doc_classifier_trained,
        "audio_features_media": audio_features_media,
        "text_semantic_neardup": text_semantic_neardup,
        "unigram_vocab_docs": unigram_vocab_docs,
        "compression_ratio_docs": compression_ratio_docs,
        "embedding_neardup": embedding_neardup,
        "ivf_topk": ivf_topk,
        "media_features": media_features,
        "image_neardup_media": image_neardup_media,
        "video_features_media": video_features_media,
        "discretize_typical_periods": discretize_typical_periods,
        "corpus_sketch_stats": corpus_sketch_stats,
        "doc_bpe_tokens": doc_bpe_tokens,
        "q1_pricing_summary": q1_pricing_summary,
        "q3_shipping_priority": q3_shipping_priority,
        "q5_nation_revenue": q5_nation_revenue,
        "top_spenders_per_nation": top_spenders_per_nation,
        "to_ip_watts": to_ip_watts,
        "normalize_minmax": normalize_minmax,
        "monthly_avg": monthly_avg,
        "gap_fill_hourly": gap_fill_hourly,
        "value_diff_per_user": value_diff_per_user,
        "p_max_by_type": p_max_by_type,
        "time_at_min": time_at_min,
        "above_avg_orders": above_avg_orders,
        "source_side": source_side,
        "rowwise_mean": rowwise_mean,
        "unstack_periods": unstack_periods,
        "asof_join_hourly": asof_join_hourly,
        "interval_join_windows": interval_join_windows,
        "rolling_1h_avg": rolling_1h_avg,
        "cumulative_user_spend": cumulative_user_spend,
        "tumbling_1h": tumbling_1h,
        "sessionize_30m": sessionize_30m,
        "graph_components": graph_components,
        "props_key_histogram": props_key_histogram,
        "salted_join_priority_revenue": salted_join_priority_revenue,
        "value_percentiles": value_percentiles,
        "doc_token_count": doc_token_count,
        "doc_quality": doc_quality,
        "lang_distribution": lang_distribution,
        "langid_heuristic": langid_heuristic,
        "dedup_exact": dedup_exact,
        "doc_dup_spans": doc_dup_spans,
        "value_rank_stats": value_rank_stats,
        "rolling_trend_by_type": rolling_trend_by_type,
        "funnel_events": funnel_events,
        "cohort_retention_weekly": cohort_retention_weekly,
        "prepare_corpus_docs": prepare_corpus_docs,
        "key_skew_event_types": key_skew_event_types,
        "crosscorpus_neardup": crosscorpus_neardup,
        "corpus_mixture": corpus_mixture,
        "asof_join_broadcast_hourly": asof_join_broadcast_hourly,
        "asof_join_tolerance_hourly": asof_join_tolerance_hourly,
        "interval_join_bucketed_windows": interval_join_bucketed_windows,
        "cube_orders": cube_orders,
        "ngram_jaccard": ngram_jaccard,
        "cosine_topk_blas": cosine_topk_blas,
        "q10_returned_items": q10_returned_items,
        "encode_docs_vocab": encode_docs_vocab,
        "hash_split_dist": hash_split_dist,
        "stratified_sample_langs": stratified_sample_langs,
        "vocab_top100": vocab_top100,
        "resample_6h": resample_6h,
        "search_topk_docs": search_topk_docs,
        "bm25_topk_docs": bm25_topk_docs,
        "rrf_fuse_docs": rrf_fuse_docs,
        "search_all_terms_docs": search_all_terms_docs,
        "domain_rank_docs": domain_rank_docs,
        "event_graph_rank": event_graph_rank,
        "link_graph_docs": link_graph_docs,
        "link_degrees_docs": link_degrees_docs,
        "url_canonical_docs": url_canonical_docs,
        "url_dedup_docs": url_dedup_docs,
        "domain_stats_docs": domain_stats_docs,
        "domain_cap_docs": domain_cap_docs,
        "blocklist_docs": blocklist_docs,
        "robots_rules_docs": robots_rules_docs,
        "robots_gate_docs": robots_gate_docs,
        "fetch_waves_docs": fetch_waves_docs,
        "html_extract_docs": html_extract_docs,
        "anchor_texts_docs": anchor_texts_docs,
        "content_blocks_docs": content_blocks_docs,
        "main_content_docs": main_content_docs,
        "domain_templates_docs": domain_templates_docs,
        "strip_templates_docs": strip_templates_docs,
        "clean_text_docs": clean_text_docs,
        "mojibake_stats_docs": mojibake_stats_docs,
        "fix_mojibake_docs": fix_mojibake_docs,
        "nfc_docs": nfc_docs,
        "hll_distinct_docs": hll_distinct_docs,
        "cm_term_counts_docs": cm_term_counts_docs,
        "langid_ngram_docs": langid_ngram_docs,
        "length_weighted_sample_docs": length_weighted_sample_docs,
        "balanced_cap_docs": balanced_cap_docs,
        "dedup_keep_best_docs": dedup_keep_best_docs,
        "split_leakage_docs": split_leakage_docs,
        "vocab_coverage_docs": vocab_coverage_docs,
        "boilerplate_docs": boilerplate_docs,
        "token_budget_select_docs": token_budget_select_docs,
        "contamination_bloom_docs": contamination_bloom_docs,
        "corpus_report_docs": corpus_report_docs,
        "chunk_docs_cdc": chunk_docs_cdc,
        "doc_min_fingerprint": doc_min_fingerprint,
        "temperature_mixture_docs": temperature_mixture_docs,
        "line_dedup_docs": line_dedup_docs,
        "line_dup_stats_docs": line_dup_stats_docs,
        "line_dedup_in_doc_docs": line_dedup_in_doc_docs,
        "minhash_keep_best_drop": minhash_keep_best_drop,
        "curate_corpus_docs": curate_corpus_docs,
        "containment_pairs_docs": containment_pairs_docs,
        "dsir_select_docs": dsir_select_docs,
        "dsir_resample_docs": dsir_resample_docs,
        "dsir_bigram_select_docs": dsir_bigram_select_docs,
        "gopher_rules_docs": gopher_rules_docs,
        "sample_per_source_docs": sample_per_source_docs,
        "corpus_diff_docs": corpus_diff_docs,
        "minhash_cluster_stats_docs": minhash_cluster_stats_docs,
        "hard_negatives_topk": hard_negatives_topk,
        "quantile_gate_docs": quantile_gate_docs,
        "perplexity_buckets_docs": perplexity_buckets_docs,
        "chunk_docs_fixed": chunk_docs_fixed,
        "chunk_docs_sentences": chunk_docs_sentences,
        "source_overlap_docs": source_overlap_docs,
        "embedding_dim_stats_q": embedding_dim_stats_q,
        "vocab_by_lang_docs": vocab_by_lang_docs,
        "distribution_shift_docs": distribution_shift_docs,
        "exact_substring_scrub_docs": exact_substring_scrub_docs,
        "dedup_bursts_events": dedup_bursts_events,
        "mixed_language_docs": mixed_language_docs,
        "script_mix_docs": script_mix_docs,
        "collocations_docs": collocations_docs,
        "textrank_docs": textrank_docs,
        "epoch_order_docs": epoch_order_docs,
        "related_terms_docs": related_terms_docs,
        "zipf_docs": zipf_docs,
        "ngram_novelty_docs": ngram_novelty_docs,
        "winnow_fp_docs": winnow_fp_docs,
        "vocab_growth_docs": vocab_growth_docs,
        "corpus_health_docs": corpus_health_docs,
        "seasonal_profile_events": seasonal_profile_events,
        "seasonal_backtest_events": seasonal_backtest_events,
        "cusum_events": cusum_events,
        "rfm_users_events": rfm_users_events,
        "js_divergence_docs": js_divergence_docs,
        "acf_hourly_events": acf_hourly_events,
        "doc_hashed_embedding": doc_hashed_embedding,
        "ccf_click_error_events": ccf_click_error_events,
        "trimmed_mean_events": trimmed_mean_events,
        "chi2_type_hour_events": chi2_type_hour_events,
        "frequent_pairs_events": frequent_pairs_events,
        "token_entropy_docs": token_entropy_docs,
        "pool_embeddings_label": pool_embeddings_label,
        "centroid_eval_embeddings": centroid_eval_embeddings,
        "score_agreement_docs": score_agreement_docs,
        "source_concentration_docs": source_concentration_docs,
        "wet_roundtrip_docs": wet_roundtrip_docs,
        "skew_card_events": skew_card_events,
        "hot_users_events": hot_users_events,
        "validate_docs": validate_docs,
        "readability_docs": readability_docs,
        "shard_plan_docs": shard_plan_docs,
        "shard_manifest_docs": shard_manifest_docs,
        "pack_stats_docs": pack_stats_docs,
        "token_length_hist_docs": token_length_hist_docs,
        "kn_lm_score_docs": kn_lm_score_docs,
        "corpus_delta_docs": corpus_delta_docs,
        "neardup_eval_docs": neardup_eval_docs,
        "span_corrupt_docs": span_corrupt_docs,
        "calibration_docs": calibration_docs,
        "leakage_safe_split_docs": leakage_safe_split_docs,
        "kn3_lm_score_docs": kn3_lm_score_docs,
        "selection_curve_docs": selection_curve_docs,
        "web_corpus_docs": web_corpus_docs,
        "mixture_plan_docs": mixture_plan_docs,
        "sketch_rollup_users": sketch_rollup_users,
        "simhash_pairs": simhash_pairs,
        "bpe_merges_docs": bpe_merges_docs,
        "wordpiece_merges_docs": wordpiece_merges_docs,
        "capacity_factor": capacity_factor,
        "zscore_outliers_by_type": zscore_outliers_by_type,
        "users_view_no_purchase": users_view_no_purchase,
        "doc_fingerprint": doc_fingerprint,
        "minhash_dedup_drop": minhash_dedup_drop,
        "top_customers": top_customers,
        "q6_forecast_revenue": q6_forecast_revenue,
        "daily_profile": daily_profile,
        "to_units_degr_mixed": to_units_degr_mixed,
        "ldc_source": ldc_source,
        "sliding_2h_1h": sliding_2h_1h,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": _Q1_SQL,
        "q3_shipping_priority": _Q3_SQL,
        "q5_nation_revenue": _Q5_SQL,
        "top_customers": _TOP_CUSTOMERS_SQL,
        "q6_forecast_revenue": _Q6_SQL,
        "top_spenders_per_nation": _TOPK_PER_NATION_SQL,
        "with_timeindex": _WITH_TIMEINDEX_SQL,
        "to_units_kelvin": _TO_UNITS_KELVIN_SQL,
        "to_units_degr_mixed": _TO_UNITS_DEGR_SQL,
        "to_ip_watts": _TO_IP_WATTS_SQL,
        "normalize_minmax": _NORMALIZE_SQL,
        "ldc": _LDC_SQL,
        "monthly_avg": _MONTHLY_SQL,
        "resample_6h": _RESAMPLE_SQL,
        "gap_fill_hourly": _GAP_FILL_SQL,
        "value_diff_per_user": _DIFF_SQL,
        "zscore_outliers_by_type": _ZSCORE_SQL,
        "p_max_by_type": _P_MAX_SQL,
        "capacity_factor": _CAPACITY_FACTOR_SQL,
        "time_at_min": _TIME_AT_MIN_SQL,
        "source_side": _SOURCE_SIDE_SQL,
        "ldc_source": _LDC_SOURCE_SQL,
        "rowwise_mean": _ROWWISE_MEAN_SQL,
        "reportdata_series": _REPORTDATA_SERIES_SQL,
        "reportdata_pivot": _REPORTDATA_PIVOT_SQL,
        "daily_profile": _DAILY_PROFILE_SQL,
        "unstack_periods": _UNSTACK_PERIODS_SQL,
        "series_align_arithmetic": _SERIES_ALIGN_SQL,
        "asof_join_hourly": _ASOF_SQL,
        "interval_join_windows": _INTERVAL_JOIN_SQL,
        "rolling_1h_avg": _ROLLING_SQL,
        "cumulative_user_spend": _CUMULATIVE_SQL,
        "tumbling_1h": _TUMBLING_SQL,
        "sliding_2h_1h": _SLIDING_SQL,
        "sessionize_30m": _SESSIONIZE_SQL,
        "users_view_no_purchase": _EXCEPT_SQL,
        "graph_components": _GRAPH_CC_SQL,
        "props_key_histogram": _PROPS_HIST_SQL,
        "salted_join_priority_revenue": _SALTED_JOIN_SQL,
        "value_percentiles": _PERCENTILES_SQL,
        "doc_token_count": _TOKEN_COUNT_SQL,
        "doc_bpe_tokens": _BPE_TOKENS_SQL,
        "doc_quality": _DOC_QUALITY_SQL,
        "lang_distribution": _LANG_DIST_SQL,
        "langid_heuristic": _langid_sql(),
        "doc_fingerprint": _DOC_FINGERPRINT_SQL,
        "dedup_exact": _DEDUP_EXACT_SQL,
        "minhash_pairs": _brute_jaccard_sql(0.5),
        "minhash_dedup_drop": _MINHASH_DEDUP_SQL,
        "ngram_jaccard": _brute_jaccard_sql(0.35),
        "cosine_topk": _COSINE_TOPK_SQL,
        "cosine_topk_blas": _COSINE_TOPK_SQL,
        "embedding_norms": _EMBEDDING_NORMS_SQL,
        "hash_split_dist": _HASH_SPLIT_SQL,
        "corpus_mixture": _CORPUS_MIXTURE_SQL,
        "vocab_top100": _VOCAB_SQL,
        "tfidf_top3": _TFIDF_SQL,
        "ngram_top100": _NGRAM_SQL,
        "redact_pii_docs": _REDACT_PII_SQL,
        "benchmark_contamination": _CONTAMINATION_SQL,
        "contamination_bloom_docs": _CONTAMINATION_SQL,
        "corpus_report_docs": _CORPUS_REPORT_SQL,
        "chunk_docs_cdc": _CHUNK_CDC_SQL,
        "line_dedup_docs": _LINE_DEDUP_SQL,
        "line_dup_stats_docs": _LINE_DUP_STATS_SQL,
        "line_dedup_in_doc_docs": _LINE_DEDUP_IN_DOC_SQL,
        "minhash_keep_best_drop": _MINHASH_KEEP_BEST_SQL,
        "curate_corpus_docs": _CURATE_SQL,
        "containment_pairs_docs": _CONTAINMENT_SQL,
        "search_topk_docs": _SEARCH_TOPK_SQL,
        "bm25_topk_docs": _BM25_TOPK_SQL,
        "sample_per_source_docs": _SAMPLE_PER_SOURCE_SQL,
        "corpus_diff_docs": _CORPUS_DIFF_SQL,
        "minhash_cluster_stats_docs": _MINHASH_CLUSTER_STATS_SQL,
        "hard_negatives_topk": _HARD_NEGATIVES_SQL,
        "quantile_gate_docs": _QUANTILE_GATE_SQL,
        "blocklist_docs": _BLOCKLIST_SQL,
        "html_extract_docs": _HTML_EXTRACT_SQL,
        "perplexity_buckets_docs": _PERPLEXITY_BUCKETS_SQL,
        "chunk_docs_fixed": _CHUNK_FIXED_SQL,
        "chunk_docs_sentences": _CHUNK_SENTENCES_SQL,
        "source_overlap_docs": _SOURCE_OVERLAP_SQL,
        "search_all_terms_docs": _SEARCH_ALL_SQL,
        "embedding_dim_stats_q": _EMB_DIM_STATS_SQL,
        "vocab_by_lang_docs": _VOCAB_BY_LANG_SQL,
        "distribution_shift_docs": _DISTRIBUTION_SHIFT_SQL,
        "exact_substring_scrub_docs": _EXACT_SUBSTRING_SQL,
        "dedup_bursts_events": _DEDUP_BURSTS_SQL,
        "mixed_language_docs": _mixed_language_sql(),
        "script_mix_docs": _SCRIPT_MIX_SQL,
        "url_canonical_docs": _URL_CANONICAL_SQL,
        "url_dedup_docs": _URL_DEDUP_SQL,
        "domain_stats_docs": _DOMAIN_STATS_SQL,
        "domain_cap_docs": _DOMAIN_CAP_SQL,
        "collocations_docs": _COLLOCATIONS_SQL,
        "textrank_docs": _textrank_sql(),
        "epoch_order_docs": _EPOCH_ORDER_SQL,
        "related_terms_docs": _related_terms_sql(),
        "zipf_docs": _ZIPF_SQL,
        "ngram_novelty_docs": _NGRAM_NOVELTY_SQL,
        "winnow_fp_docs": _WINNOW_SQL,
        "vocab_growth_docs": _VOCAB_GROWTH_SQL,
        "corpus_health_docs": _CORPUS_HEALTH_SQL,
        "seasonal_profile_events": _SEASONAL_SQL,
        "seasonal_backtest_events": _SEASONAL_BACKTEST_SQL,
        "cusum_events": _CUSUM_SQL,
        "rfm_users_events": _RFM_SQL,
        "event_graph_rank": _event_graph_rank_sql(),
        "js_divergence_docs": _JS_DIVERGENCE_SQL,
        "acf_hourly_events": _acf_sql(),
        "ccf_click_error_events": _ccf_sql(),
        "trimmed_mean_events": _TRIMMED_MEAN_SQL,
        "chi2_type_hour_events": _CHI2_SQL,
        "frequent_pairs_events": _FREQUENT_PAIRS_SQL,
        "token_entropy_docs": _TOKEN_ENTROPY_SQL,
        "pool_embeddings_label": _POOL_EMBEDDINGS_SQL,
        "centroid_eval_embeddings": _CENTROID_EVAL_SQL,
        "score_agreement_docs": _SCORE_AGREEMENT_SQL,
        "source_concentration_docs": _SOURCE_CONCENTRATION_SQL,
        "wet_roundtrip_docs": _WET_ROUNDTRIP_SQL,
        "skew_card_events": _SKEW_CARD_SQL,
        "hot_users_events": _HOT_USERS_SQL,
        "validate_docs": _VALIDATE_DOCS_SQL,
        "readability_docs": _READABILITY_SQL,
        "link_graph_docs": _LINK_GRAPH_SQL,
        "link_degrees_docs": _LINK_DEGREES_SQL,
        "shard_plan_docs": _SHARD_PLAN_SQL,
        "shard_manifest_docs": _SHARD_MANIFEST_SQL,
        "domain_rank_docs": _domain_rank_sql(),
        "robots_rules_docs": _ROBOTS_RULES_SQL,
        "robots_gate_docs": _ROBOTS_GATE_SQL,
        "fetch_waves_docs": _FETCH_WAVES_SQL,
        "hll_distinct_docs": _hll_distinct_sql(),
        "sketch_rollup_users": _sketch_rollup_sql(),
        "doc_min_fingerprint": _DOC_MIN_FP_SQL,
        "simhash_pairs": _SIMHASH_PAIRS_SQL,
        "bpe_merges_docs": _bpe_merges_sql(),
        "wordpiece_merges_docs": _wordpiece_merges_sql(),
        "pack_stats_docs": _PACK_STATS_SQL,
        "token_length_hist_docs": _TOKEN_LENGTH_HIST_SQL,
        "kn_lm_score_docs": _KN_LM_SCORE_SQL,
        "corpus_delta_docs": _CORPUS_DELTA_SQL,
        "neardup_eval_docs": _NEARDUP_EVAL_SQL,
        "span_corrupt_docs": _SPAN_CORRUPT_SQL,
        "calibration_docs": _CALIBRATION_SQL,
        "clean_text_docs": _CLEAN_TEXT_SQL,
        "mojibake_stats_docs": _MOJIBAKE_STATS_SQL,
        "fix_mojibake_docs": _FIX_MOJIBAKE_SQL,
        "nfc_docs": _NFC_SQL,
        "leakage_safe_split_docs": _LEAKAGE_SAFE_SPLIT_SQL,
        "rrf_fuse_docs": _RRF_FUSE_SQL,
        "anchor_texts_docs": _ANCHOR_TEXTS_SQL,
        "content_blocks_docs": _CONTENT_BLOCKS_SQL,
        "main_content_docs": _MAIN_CONTENT_SQL,
        "domain_templates_docs": _DOMAIN_TEMPLATES_SQL,
        "strip_templates_docs": _STRIP_TEMPLATES_SQL,
        "kn3_lm_score_docs": _KN3_LM_SCORE_SQL,
        "selection_curve_docs": _SELECTION_CURVE_SQL,
        "web_corpus_docs": _WEB_CORPUS_SQL,
        "langid_ngram_docs": _LANGID_NGRAM_SQL,
        "mixture_plan_docs": _MIXTURE_PLAN_SQL,
        "dsir_select_docs": _DSIR_SQL,
        "dsir_resample_docs": _DSIR_RESAMPLE_SQL,
        "dsir_bigram_select_docs": _DSIR_BIGRAM_SQL,
        "gopher_rules_docs": _GOPHER_SQL,
        "temperature_mixture_docs": _TEMPERATURE_MIX_SQL,
        "doc_hashed_embedding": _HASHED_EMB_SQL,
        "q4_late_orders": _Q4_SQL,
        "doc_repetition": _REPETITION_SQL,
        "pack_sequences_docs": _PACK_SQL,
        "q13_order_distribution": _Q13_SQL,
        "q19_disjunctive_revenue": _Q19_SQL,
        "melt_lineitem_measures": _MELT_SQL,
        "quantize_embeddings": _QUANTIZE_SQL,
        "q18_large_volume": _Q18_SQL,
        "degree_days_daily": _DEGREE_DAYS_SQL,
        "ewma_final_per_user": _EWMA_SQL,
        "twa_per_user": _TWA_SQL,
        "url_stats_docs": _URL_STATS_SQL,
        "clean_corpus_docs": _clean_corpus_sql(),
        "q7_volume_shipping": _Q7_SQL,
        "q8_market_share": _Q8_SQL,
        "q9_product_profit": _Q9_SQL,
        "q10_returned_items": _Q10_SQL,
        "q14_promo_revenue": _Q14_SQL,
        "q15_top_supplier": _Q15_SQL,
        "q17_small_quantity_revenue": _Q17_SQL,
        "q21_suppliers_kept_waiting": _Q21_SQL,
        "q22_sales_opportunity": _Q22_SQL,
        "q2_min_cost_supplier": _Q2_SQL,
        "q11_important_stock": _Q11_SQL,
        "q12_late_lines_by_status": _Q12_SQL,
        "q16_supplier_count": _Q16_SQL,
        "q20_excess_shippers": _Q20_SQL,
        "semdedup_pairs": _SEMDEDUP_PAIRS_SQL,
        "semdedup_keep": _SEMDEDUP_KEEP_SQL,
        "doc_classifier_score": _CLASSIFIER_SQL,
        "doc_lm_score": _LM_SCORE_SQL,
        "value_trend_by_type": _TREND_SQL,
        "robust_scale_by_type": _ROBUST_SCALE_SQL,
        "doc_dup_spans": _DUP_SPANS_SQL,
        "value_rank_stats": _RANK_STATS_SQL,
        "rolling_trend_by_type": _ROLLING_TREND_SQL,
        "funnel_events": _FUNNEL_SQL,
        "cohort_retention_weekly": _COHORT_SQL,
        "prepare_corpus_docs": _prepare_corpus_sql(),
        "key_skew_event_types": _SKEW_SQL,
        "crosscorpus_neardup": _CROSSCORPUS_SQL,
        "encode_docs_vocab": _ENCODE_SQL,
        "rollup_sales": _ROLLUP_SQL,
        "cube_orders": _CUBE_SQL,
        "ntile_quartiles": _NTILE_SQL,
        "corpus_cardinality": _CARDINALITY_SQL,
        "cm_term_counts_docs": _CM_TERMS_SQL,
        "asof_join_broadcast_hourly": _ASOF_SQL,
        "asof_join_tolerance_hourly": _ASOF_TOL_SQL,
        "interval_join_bucketed_windows": _INTERVAL_JOIN_SQL,
        "stratified_sample_langs": _STRATIFIED_SQL,
        "length_weighted_sample_docs": _LENGTH_WEIGHTED_SQL,
        "balanced_cap_docs": _BALANCED_CAP_SQL,
        "dedup_keep_best_docs": _KEEP_BEST_SQL,
        "split_leakage_docs": _SPLIT_LEAKAGE_SQL,
        "vocab_coverage_docs": _VOCAB_COVERAGE_SQL,
        "boilerplate_docs": _BOILERPLATE_SQL,
        "token_budget_select_docs": _TOKEN_BUDGET_SQL,
        "incremental_dedup_docs": _INCREMENTAL_DEDUP_SQL,
        "fuzzy_pairs_prefix": _FUZZY_SQL,
        "above_avg_orders": _ABOVE_AVG_SQL,
    }
