"""Stateful streaming sessionization — ``applyInPandasWithState``.

The batch sessionizer (``operators/events.py``) is a window over the full
history; a stream cannot replay history per micro-batch, so session
continuity must live in keyed state. This operator keeps ``(last_epoch,
session_seq)`` per user: an event within ``gap_minutes`` of the user's last
seen event continues the CURRENT session — even when the two events arrived
in different micro-batches — and a longer silence opens the next one.

Semantics vs batch ``sessionize``: identical when events arrive in
event-time order (the per-batch frame is sorted on (ts, event_id) before
state is applied); cross-batch stragglers older than the state's last_epoch
are assigned at arrival using the same gap rule — the documented
at-arrival-order contract of stream sessionization (bound disorder upstream
with a watermark if exact event-time sessions are required).

State is Arrow-tuple encoded (no per-row Python beyond the numpy-style
column pass inside each Arrow batch); state size is O(2 scalars × active
users).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "event_id long, user_id long, ts timestamp, session_seq long"
STATE_SCHEMA = "last_epoch double, seq long"


def sessionize_stream(events: DataFrame, *, gap_minutes: float = 30.0) -> DataFrame:
    """(event_id, user_id, ts, session_seq) with cross-batch continuity.

    ``events`` is a *streaming* DataFrame with at least
    (event_id long, user_id long, ts timestamp).
    """
    gap = float(gap_minutes) * 60.0

    def assign(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_epoch, seq = state.get
        else:
            last_epoch, seq = None, 0
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            epochs = pdf["ts"].astype("int64").to_numpy() / 1e9
            seqs = []
            for e in epochs:
                if last_epoch is None or (e - last_epoch) > gap:
                    seq += 1
                last_epoch = float(e)
                seqs.append(seq)
            out = pdf[["event_id", "user_id", "ts"]].copy()
            out["session_seq"] = seqs
            yield out
        if last_epoch is not None:
            state.update((float(last_epoch), int(seq)))

    return (
        events.select("event_id", "user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            assign, OUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )
