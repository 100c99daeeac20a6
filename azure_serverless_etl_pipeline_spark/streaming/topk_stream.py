"""Continuous heavy hitters: SpaceSaving top-k on applyInPandasWithState.

The streaming twin of the batch mergeable top-k rollup (x98,
operators/sketches): per group (event_type), maintain a bounded
SpaceSaving summary — capacity-``m`` (item, count, err) arrays — and
emit the current top-k with error bounds after every micro-batch.

SpaceSaving guarantees (Metwally et al. 2005): with capacity m over a
stream of N items, every item with true count > N/m is IN the summary,
and for each tracked item true_count ∈ [count − err, count]. An item is
``guaranteed`` top-k when its lower bound beats the (k+1)-th upper
bound — the same bound discipline the batch rollup (x98) exposes, so a
consumer can treat batch and stream outputs identically.

State is two fixed-shape arrays per group — O(|groups|·m) total, never
O(|distinct items|): the property that lets this run forever on an
unbounded key stream where exact streaming counts (dropDuplicates-style
state) would grow without bound.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("items", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("errs", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
    ]
)

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("item", T.LongType()),
        T.StructField("est", T.LongType()),       # upper bound
        T.StructField("lb", T.LongType()),        # est - err (lower bound)
        T.StructField("rank", T.IntegerType()),
        T.StructField("guaranteed", T.BooleanType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def _spacesaving_merge(
    summary: dict[int, tuple[int, int]],
    batch_counts: "pd.Series",
    m: int,
) -> dict[int, tuple[int, int]]:
    """Merge exact batch counts into a SpaceSaving summary of size <= m.

    Tracked items add exactly (their batch count). A new item evicts the
    current minimum, inheriting its count as error — the standard
    SpaceSaving step applied count-at-a-time (equivalent to item-at-a-
    time for guarantees, cheaper per batch).
    """
    for item, c in batch_counts.items():
        item, c = int(item), int(c)
        if item in summary:
            cnt, err = summary[item]
            summary[item] = (cnt + c, err)
        elif len(summary) < m:
            summary[item] = (c, 0)
        else:
            evict = min(summary, key=lambda i: summary[i][0])
            min_cnt, _ = summary[evict]
            del summary[evict]
            summary[item] = (min_cnt + c, min_cnt)
    return summary


def _make_topk(m: int, k: int):
    def _update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        if state.exists:
            items, counts, errs, n_seen = state.get
            summary = {
                int(i): (int(c), int(e))
                for i, c, e in zip(items, counts, errs)
            }
        else:
            summary, n_seen = {}, 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        # exact per-batch counts first: one pass, then one merge per
        # distinct item (not per event)
        bc = batch["item"].value_counts().sort_index()
        n_seen += int(len(batch))
        summary = _spacesaving_merge(summary, bc, m)

        items = list(summary)
        state.update(
            (
                items,
                [summary[i][0] for i in items],
                [summary[i][1] for i in items],
                int(n_seen),
            )
        )

        ranked = sorted(
            summary.items(), key=lambda kv: (-kv[1][0], kv[0])
        )
        if len(ranked) > k:
            kplus1_ub = ranked[k][1][0]
        elif len(summary) >= m:
            # Summary saturated with <= k tracked items: an evicted
            # (untracked) item's true count can reach the summary
            # minimum, so that — not 0 — is the competitor bound.
            kplus1_ub = min(cnt for cnt, _ in summary.values())
        else:
            kplus1_ub = 0
        rows = []
        for rank, (item, (cnt, err)) in enumerate(ranked[:k], start=1):
            rows.append(
                {
                    "event_type": key[0],
                    "item": item,
                    "est": cnt,
                    "lb": cnt - err,
                    "rank": rank,
                    "guaranteed": (cnt - err) >= kplus1_ub,
                    "n_seen": n_seen,
                }
            )
        yield pd.DataFrame(rows, columns=[f.name for f in _OUT_SCHEMA.fields])

    return _update


def topk_stream(
    stream: DataFrame,
    group_col: str = "event_type",
    item_col: str = "user_id",
    m: int = 64,
    k: int = 10,
) -> DataFrame:
    """Continuous top-k per group over an unbounded item domain.

    Update-mode output: after each micro-batch, the current top-``k``
    (item, upper/lower bound, guaranteed flag) per group. Capacity ``m``
    trades memory for bound tightness exactly as in the batch rollup.
    """
    prepped = stream.select(
        stream[group_col].alias("event_type"),
        stream[item_col].cast("long").alias("item"),
    )
    return prepped.groupBy("event_type").applyInPandasWithState(
        _make_topk(m, k),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
