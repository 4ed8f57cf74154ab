"""Stateful streaming twin of operators.state.running_snapshots
(reference: StreamOrderbooks' in-memory running orderbook,
internal/input/orderbooks.go:194-237, fed per-ledger over a Go channel).

Spark shape: ``applyInPandasWithState`` keyed by ledger key.  The state is
the key's latest (ordering key, change type, payload-json) triple; each
micro-batch folds its changes into the state and emits the key's current
state row (update mode).  Removal tombstones persist in state — exactly the
reference's delete-then-maybe-recreate behavior — and are filtered at read.

State is O(live keys) across the cluster, partitioned by key hash; no
driver-side state anywhere (the reference holds the whole book in one
process — this is the part Spark fixes for free).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

REMOVED = 2

OUTPUT_SCHEMA = (
    "ledger_key string, ledger_sequence long, change_index long, "
    "change_type int, payload string, deleted boolean"
)
STATE_SCHEMA = "ord long, change_type int, ledger_sequence long, change_index long, payload string"


def _fold_state(key, pdf_iter: Iterator, state: GroupState) -> Iterator[Any]:
    import pandas as pd

    if state.exists:
        ord_key, ctype, seq, idx, payload = state.get
    else:
        ord_key, ctype, seq, idx, payload = -1, -1, -1, -1, None

    for pdf in pdf_iter:
        ords = pdf["ledger_sequence"].astype("int64") * (1 << 20) + pdf[
            "change_index"
        ].astype("int64")
        best = int(ords.idxmax())
        if int(ords.loc[best]) > ord_key:
            ord_key = int(ords.loc[best])
            ctype = int(pdf["change_type"].loc[best])
            seq = int(pdf["ledger_sequence"].loc[best])
            idx = int(pdf["change_index"].loc[best])
            payload = pdf["payload"].loc[best]

    state.update((ord_key, ctype, seq, idx, payload))
    yield pd.DataFrame(
        {
            "ledger_key": [key[0]],
            "ledger_sequence": [seq],
            "change_index": [idx],
            "change_type": [ctype],
            "payload": [payload],
            "deleted": [ctype == REMOVED],
        }
    )


def stream_running_state(changes_stream: DataFrame) -> DataFrame:
    """Per-key running state over an unbounded change stream.

    Input stream columns: ledger_key, ledger_sequence, change_index,
    change_type, payload (pre-serialize entity payloads to JSON — keeps the
    state row fixed-schema).  Returns the update-mode stream of current
    states; filter ``deleted`` at the sink for the live book.
    """
    return changes_stream.groupBy("ledger_key").applyInPandasWithState(
        _fold_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
