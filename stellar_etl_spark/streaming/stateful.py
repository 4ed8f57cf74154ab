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
        # nullable Int64: a NULL sequence/index makes the ORDER KEY null and
        # the row is skipped, exactly like the batch twin's max_by (a plain
        # astype("int64") raised on the NaN instead — found by the hostile
        # streaming program; Int64 keeps 2^51-scale ords exact, no float)
        ords = pdf["ledger_sequence"].astype("Int64") * (1 << 20) + pdf[
            "change_index"
        ].astype("Int64")
        if not ords.notna().any():
            continue
        best = int(ords.idxmax())  # idxmax skips NA
        if int(ords.loc[best]) > ord_key:
            ord_key = int(ords.loc[best])
            ctype = int(pdf["change_type"].loc[best])
            seq = int(pdf["ledger_sequence"].loc[best])
            idx = int(pdf["change_index"].loc[best])
            val = pdf["payload"].loc[best]
            payload = None if pd.isna(val) else val

    if ord_key == -1:
        # only NULL-order rows ever seen for this key: the batch twin's
        # max_by group carries all-NULL columns and its tombstone filter
        # drops the row — emit nothing, keep no state
        yield pd.DataFrame(
            {
                "ledger_key": pd.Series([], dtype="object"),
                "ledger_sequence": pd.Series([], dtype="int64"),
                "change_index": pd.Series([], dtype="int64"),
                "change_type": pd.Series([], dtype="int32"),
                "payload": pd.Series([], dtype="object"),
                "deleted": pd.Series([], dtype="bool"),
            }
        )
        return

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


SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start_us long, session_end_us long, n_events long"
)
SESSION_STATE_SCHEMA = "session_start_us long, last_ts_us long, n_events long"


def _make_session_fold(gap_us: int):
    def _session_fold(key, pdf_iter: Iterator, state: GroupState) -> Iterator[Any]:
        import pandas as pd

        cols = ["user_id", "session_start_us", "session_end_us", "n_events"]

        if state.hasTimedOut:
            out = []
            if state.exists:
                s0, last, n = state.get
                out.append((key[0], s0, last, n))
            state.remove()
            yield pd.DataFrame(out, columns=cols)
            return

        if state.exists:
            s0, last, n = state.get
        else:
            s0, last, n = None, None, 0

        rows = pd.concat(list(pdf_iter), ignore_index=True)
        # a NULL event time has no place on a gap timeline — drop it, the
        # same way the watermark machinery treats null event time (NaT
        # would otherwise become int64-min here, poisoning `last` and
        # making setTimeoutTimestamp reject the negative value — found by
        # the hostile streaming program)
        rows = rows[rows["ts"].notna()]
        rows["ts_us"] = rows["ts"].astype("int64") // 1000
        rows = rows.sort_values(["ts_us", "event_id"])

        closed = []
        for ts_us in rows["ts_us"]:
            ts_us = int(ts_us)
            if last is None:
                s0, last, n = ts_us, ts_us, 1
            elif ts_us - last > gap_us:
                closed.append((key[0], s0, last, n))
                s0, last, n = ts_us, ts_us, 1
            else:
                # a late-but-in-gap event must never move the session END
                # backwards (it would close the session early on the next
                # gap test and fire the timeout prematurely) nor its START
                # forwards — fold with min/max, not assignment
                s0 = min(s0, ts_us)
                last = max(last, ts_us)
                n += 1

        if last is None:
            # nothing but NULL-time rows and no prior session: no state to
            # keep, no timeout to arm
            yield pd.DataFrame(closed, columns=cols)
            return
        state.update((s0, last, n))
        # finalize the open session when the event-time watermark passes
        # last event + gap (ms granularity)
        state.setTimeoutTimestamp(last // 1000 + gap_us // 1000)
        yield pd.DataFrame(closed, columns=cols)

    return _session_fold


def stream_sessionize(
    events_stream: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming twin of operators.sessionize.session_stats: gap-based
    sessions finalized exactly once, either in-batch (a later event opens
    the next session) or by EVENT-TIME TIMEOUT when the watermark passes
    ``last_event + gap`` — the standard session-with-timeout pattern.

    State per live user is one (start, last, count) triple — O(active
    users), evicted on timeout; append-mode output so every emitted session
    row is final.  Input columns: user_id long, event_id long, ts timestamp.
    """
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fold(gap_seconds * 1_000_000),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
