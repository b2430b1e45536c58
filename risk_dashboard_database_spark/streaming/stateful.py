"""Custom stateful streaming operator: the T2 crisis chain as
applyInPandasWithState (SURVEY §2.10 "stateful per-entity
continuation").

Batch-side, `operators/sessionize.chain_active` linearizes the
recurrence into pure window functions. In a stream you cannot window
over unbounded history, so the streaming formulation carries exactly
the state the recurrence needs — (last_date, last_active) per entity —
in the Spark state store and folds each micro-batch's rows through the
same transition:

    active(d) = gate(d) AND (trig(d) OR (cont(d) AND active(d-1)))
    carried active resets across calendar gaps

(`dashboard_app/crisis_event_rollups.py:639-683`). State is two
scalars per entity — bounded regardless of stream length, the shape
`flatMapGroupsWithState` exists for.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, date date, errors long, total long, active boolean"
STATE_SCHEMA = "last_date date, last_active boolean"


def _transition(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        last_date, last_active = state.get
    else:
        last_date, last_active = None, False

    rows: list[dict[str, Any]] = []
    # A group's rows can arrive as MULTIPLE Arrow chunks with no
    # cross-chunk order guarantee — concatenate first, THEN sort once;
    # sorting each chunk independently would fold days out of order
    # for any group larger than one Arrow batch (~10k rows).
    chunks = list(batches)
    pdfs = [pd.concat(chunks).sort_values("date")] if chunks else []
    for pdf in pdfs:
        for row in pdf.itertuples(index=False):
            gate = row.total >= 2
            trig = row.errors >= 3
            cont = row.errors >= 1 and row.errors / row.total >= 0.2
            consecutive = (
                last_date is not None and (row.date - last_date).days == 1
            )
            active = bool(gate and (trig or (cont and last_active and consecutive)))
            rows.append(
                {
                    "user_id": user_id,
                    "date": row.date,
                    "errors": row.errors,
                    "total": row.total,
                    "active": active,
                }
            )
            last_date, last_active = row.date, active

    state.update((last_date, last_active))
    yield pd.DataFrame(rows, columns=["user_id", "date", "errors", "total", "active"])


def stream_crisis_chain(daily: DataFrame) -> DataFrame:
    """Streaming crisis-chain over a stream of per-(user, date) daily
    rows (columns: user_id, date, errors, total). Each entity's state
    is (last_date, last_active); rows within a micro-batch are folded
    in date order, so replaying history through availableNow yields
    exactly the batch `chain_active` result (tested)."""
    return daily.groupBy("user_id").applyInPandasWithState(
        _transition,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
