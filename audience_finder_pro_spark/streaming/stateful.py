"""Custom stateful streaming operator (SURVEY §2.9/§2.10 D3 streaming tier).

``applyInPandasWithState`` is the engine's extension point for stateful
logic that windowed aggregates can't express: arbitrary per-key state
carried across micro-batches, Arrow-batched on both sides (no
row-at-a-time Python). The demo operator keeps per-user running
totals — the streaming analogue of the reference's incremental
scan-progress accumulation (/root/reference/app.py:36-62, which keeps
running counts across its sequential fetch loop).

Scale notes: state is one (count, total) pair per key — O(distinct
users) bounded; a production deployment adds a GroupStateTimeout so
idle keys are evicted, keeping state proportional to *active* keys.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _update_running_totals(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
    )


def running_totals(events: DataFrame) -> DataFrame:
    """Per-user cumulative (count, sum) emitted every micro-batch the user
    appears in — each emission reflects ALL events seen for that key so far."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
