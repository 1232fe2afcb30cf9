"""Custom stateful streaming operator: a per-host politeness gate whose
budget persists ACROSS micro-batches via ``applyInPandasWithState``.

The batch scheduler enforces per-round budgets with a window (O4); a
continuously-fed frontier needs the cross-batch version: a host that spent
its budget in batch N must stay throttled in batch N+1 regardless of which
executor sees it. GroupState keyed by host carries the spent-count; rows
are admitted best-priority-first until the host's lifetime cap is hit.
This is the `applyInPandasWithState` pattern the engine uses for any
custom stateful operator (state = one small tuple per key, Arrow-batched
data plane, timeout-free)."""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ADMITTED_SCHEMA = (
    "host string, url_canon string, url_hash long, priority double, spent int"
)
STATE_SCHEMA = "spent int"


def host_budget_gate(candidates: DataFrame, lifetime_budget: int = 20) -> DataFrame:
    """Streaming DataFrame of candidate rows → admitted rows, at most
    ``lifetime_budget`` per host over the stream's lifetime."""

    def gate(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (host,) = key
        spent = state.get[0] if state.exists else 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(
            ["priority", "url_hash"], ascending=[False, True]
        )
        room = max(0, lifetime_budget - spent)
        admitted = batch.head(room)
        spent += len(admitted)
        state.update((spent,))
        yield pd.DataFrame(
            {
                "host": host,
                "url_canon": admitted["url_canon"],
                "url_hash": admitted["url_hash"],
                "priority": admitted["priority"],
                "spent": spent,
            }
        )

    return (
        candidates.groupBy("host")
        .applyInPandasWithState(
            gate,
            outputStructType=ADMITTED_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
