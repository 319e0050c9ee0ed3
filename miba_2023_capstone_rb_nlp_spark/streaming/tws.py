"""Custom stateful streaming operator on the ``transformWithState``
API (Spark 4's arbitrary-state successor to applyInPandasWithState —
SURVEY §2.10 engine addition; the reference has no streaming at all).

Where applyInPandasWithState carries ONE tuple of state per key,
transformWithState exposes named, typed state HANDLES per key —
here a ValueState (fixed-width running totals) plus a MapState
(per-event-type counts, |event-types|-bounded). That is the shape a
training-data ingest profile actually needs: O(1)+O(types) state per
user regardless of event volume, checkpointed by the state store and
partitioned by the grouping key (one hash exchange per micro-batch).

Money is accumulated in integer cents inside the ValueState (the
stateful.py recipe) so the running sum is exact and batch-split
independent.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUT_SCHEMA = (
    "user_id bigint, n_events bigint, sum_value double, "
    "n_types bigint, top_type string"
)


class UserProfileProcessor(StatefulProcessor):
    """Per-user running profile: count + exact money sum (ValueState)
    and per-event-type counts (MapState) → emits the updated snapshot
    each micro-batch; the last emission per user equals the batch
    aggregate. ``top_type`` breaks count ties by type ASC so the
    argmax is deterministic under any batch split."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.totals = handle.getValueState(
            "totals", "n bigint, cents bigint"
        )
        self.type_counts = handle.getMapState(
            "type_counts", "t string", "c bigint"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, cents = self.totals.get() if self.totals.exists() else (0, 0)
        for pdf in rows:
            n += len(pdf)
            vals = pdf["value"].dropna()
            if len(vals):
                # quantize each element to integer cents BEFORE the
                # sum — no float accumulation across batches
                cents += int((vals * 100).round().astype("int64").sum())
            for t, c in pdf["event_type"].value_counts().items():
                prev = (
                    self.type_counts.getValue((t,))[0]
                    if self.type_counts.containsKey((t,))
                    else 0
                )
                self.type_counts.updateValue((t,), (prev + int(c),))
        self.totals.update((n, cents))
        counts = {
            k[0]: v[0]
            for k, v in self.type_counts.iterator()
        }
        # a key whose rows so far all carry null event_type has an
        # empty map — min() over it would kill the query
        top = (
            min(counts, key=lambda t: (-counts[t], t)) if counts else None
        )
        # r16: typed 1-row ndarray columns skip pandas' per-call type
        # inference (same hot-loop device as stateful.py — this runs
        # once per (user, micro-batch))
        yield pd.DataFrame(
            {
                "user_id": np.array([key[0]], dtype=np.int64),
                "n_events": np.array([n], dtype=np.int64),
                "sum_value": np.array([cents / 100.0]),
                "n_types": np.array([len(counts)], dtype=np.int64),
                "top_type": [top],
            }
        )

    def close(self) -> None:
        pass


def running_user_profiles(events: DataFrame) -> DataFrame:
    return events.groupBy("user_id").transformWithStateInPandas(
        UserProfileProcessor(),
        outputStructType=OUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
