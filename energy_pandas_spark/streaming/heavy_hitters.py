"""Streaming heavy hitters: a distributed SpaceSaving (Misra-Gries
family) sketch over an item column, via ``applyInPandasWithState``.

Items route to ``n_groups`` hash groups (every occurrence of an item
lands in the SAME group), and each group maintains an independent
SpaceSaving summary of at most ``capacity`` counters in keyed state.
The union of the group summaries is the corpus sketch: for any item,
``count`` overestimates its true frequency by at most ``error``, and
every item whose true count exceeds its group's (group_total /
capacity) is guaranteed present — the classic SpaceSaving bounds,
applied per group (routing is deterministic, so a group sees ALL of an
item's occurrences and the per-group bound IS the global bound).

Scale shape: state is O(capacity) per group regardless of stream age
or item cardinality; the only shuffle is the groupBy(group) any keyed
stateful operator needs; batches arrive as Arrow frames and are
pre-aggregated (value_counts) before touching the sketch, so the
per-item Python work is per DISTINCT item per batch, not per row.
Emission is per-trigger in update mode: the group's full current
summary, stamped with the batch's group total so consumers can apply
the frequency bound.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator, Tuple

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame

__all__ = ["streaming_heavy_hitters", "HH_OUTPUT_SCHEMA"]

HH_OUTPUT_SCHEMA = StructType(
    [
        StructField("group", IntegerType()),
        StructField("item", StringType()),
        StructField("count", LongType()),
        StructField("error", LongType()),
        StructField("group_total", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("items", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("errors", ArrayType(LongType())),
        StructField("total", LongType()),
    ]
)


def _make_hh_fn(capacity: int):
    def fn(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - NoTimeout configured
            state.remove()
            return
        if state.exists:
            items, counts, errors, total = state.get
            sketch = {
                it: [c, e] for it, c, e in zip(items, counts, errors)
            }
        else:
            sketch, total = {}, 0
        # concat the WHOLE micro-batch before counting (the sibling
        # cusum/anomaly kernels do the same): per-chunk processing
        # would make eviction order depend on Arrow chunk boundaries,
        # which vary across retries/replays — the sketch must be a
        # function of the batch CONTENT only
        whole = pd.concat(list(pdfs), ignore_index=True)
        if len(whole):
            # batch pre-aggregation: SpaceSaving is order-insensitive
            # within a batch for already-tracked items; for new items we
            # still insert occurrence-by-occurrence logically, but a
            # whole batch of the same item collapses to one update
            vc = whole["item"].value_counts()
            # deterministic order: by item string, so replays and
            # partition orderings produce identical sketches
            for item in sorted(vc.index):
                k = int(vc[item])
                total += k
                if item in sketch:
                    sketch[item][0] += k
                elif len(sketch) < capacity:
                    sketch[item] = [k, 0]
                else:
                    # evict the current min (ties: lexicographically
                    # smallest item, for determinism)
                    evict = min(sketch, key=lambda i: (sketch[i][0], i))
                    mn = sketch[evict][0]
                    del sketch[evict]
                    sketch[item] = [mn + k, mn]
        out_items = sorted(sketch)
        state.update(
            (
                out_items,
                [sketch[i][0] for i in out_items],
                [sketch[i][1] for i in out_items],
                total,
            )
        )
        yield pd.DataFrame(
            {
                "group": [key[0]] * len(out_items),
                "item": out_items,
                "count": [sketch[i][0] for i in out_items],
                "error": [sketch[i][1] for i in out_items],
                "group_total": [total] * len(out_items),
            }
        )

    return fn


def streaming_heavy_hitters(
    events: "DataFrame",
    item_col: str = "event_type",
    capacity: int = 16,
    n_groups: int = 8,
) -> "DataFrame":
    """Maintain a SpaceSaving heavy-hitter summary of ``item_col`` on a
    stream (or a batch frame, for differential testing — the operator
    body is identical).

    Output (update mode): one row per tracked counter per trigger —
    (group, item, count, error, group_total); ``count`` >= true
    frequency >= ``count - error``.
    """
    grouped = events.select(
        F.col(item_col).cast("string").alias("item"),
        F.pmod(F.xxhash64(F.col(item_col).cast("string")), F.lit(n_groups))
        .cast("int")
        .alias("group"),
    ).groupBy("group")
    return grouped.applyInPandasWithState(
        _make_hh_fn(capacity),
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
