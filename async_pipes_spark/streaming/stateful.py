"""Custom stateful streaming stages via applyInPandasWithState — the
engine's analogue of the reference's shared-state stage closures
(reference src/lib.rs:140-187: an Arc<Mutex> running sum updated per
record), re-expressed as per-key managed state that survives triggers
and scales horizontally (state is partitioned by key across executors,
checkpointed by the streaming engine).

Determinism contract: money is accumulated as integer cents
(``floor(value*100 + 0.5)`` — IEEE-exact on 2-decimal doubles), never
as floating-point sums, so results are order- and engine-independent.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_fold_per_user(events: DataFrame) -> DataFrame:
    """Running per-user fold over a streaming events frame:
    (user_id, n, cents) — event count and exact money total.

    Each trigger updates the key's state and emits its current totals;
    under availableNow over a finite source the final emission equals
    the batch groupBy fold (quiescence ≙ wait())."""

    def fold(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, cents = state.get if state.exists else (0, 0)
        for pdf in batches:
            n += len(pdf)
            # integer-cents accumulation: exact & order-independent
            # (floor(x*100 + 0.5) — the shared micro-units formula).
            # NULL values arrive as NaN, and floor(NaN).astype(int64)
            # is INT64_MIN garbage that would permanently corrupt the
            # checkpointed total — mask them out, matching the
            # null-skipping SUM of the batch-fold oracle (n still
            # counts the row, like COUNT(*))
            vals = pdf["value"].to_numpy(dtype="float64")
            vals = vals[~np.isnan(vals)]
            cents += int(np.floor(vals * 100.0 + 0.5).astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame({"user_id": [key[0]], "n": [n], "cents": [cents]})

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType="user_id bigint, n bigint, cents bigint",
            stateStructType="n bigint, cents bigint",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
