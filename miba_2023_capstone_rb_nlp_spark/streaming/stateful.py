"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY §2.10 engine addition — the reference has no streaming at
all; this is the Structured Streaming path for operators that need
per-key state beyond built-in windows/dedup, e.g. running per-user
profiles feeding a training-data pipeline).

Scale design: state lives in the state store, partitioned by the
grouping key — one hash shuffle per micro-batch, per-key state is a
fixed-width tuple (O(1) per user), so an unbounded feed holds
|users| × ~32 bytes of state per partition regardless of event
volume. Money is accumulated in integer cents inside the state so the
running sum is exact and order-independent (the same recipe as
functions/numeric.py's decimal sums — both engines land on the
identical nearest double at the end).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
_STATE_SCHEMA = "n bigint, cents bigint"


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, exact money sum) over an event stream.

    Emits the updated running totals for every user seen in each
    micro-batch; the LAST emission per user equals the batch
    ``groupBy(user).agg(count, sum)`` — which is what the oracle
    checks after max_by-reduction.
    """

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            vals = pdf["value"].dropna()
            # exact: values carry 2 decimals; quantize each element to
            # integer cents BEFORE summing (no float accumulation)
            if len(vals):
                cents += int((vals * 100).round().astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [cents / 100.0]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
