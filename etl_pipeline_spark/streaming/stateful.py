"""Custom stateful streaming operator — SURVEY.md §2.10: the reference's
DoFn-with-state (CountRecords, dataflow_transform.py:75-89) generalized
to a keyed running profile via ``applyInPandasWithState``.

Per user_id the state holds (n_events, total_value, last_ts); each
micro-batch folds its rows into the state and emits the updated profile.
State is bounded by key cardinality and checkpointed — the streaming
equivalent of a running GROUP BY that never re-reads history.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_ts timestamp"
STATE_SCHEMA = "n long, total double, last_ts timestamp"


def _update_profile(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    n, total, last_ts = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        # .sum() skips NaN (NULL values) — a value-less event still
        # counts in n_events but adds nothing to the total
        total += float(pdf["value"].sum())
        # dropna: a NULL ts arrives as NaT, and serializing NaT into
        # the timestamp state column crashes the micro-batch
        # ("NaTType does not support timetuple" — r8 streaming fuzz);
        # a timestamp-less event must not move last_ts either way
        batch_max = pdf["ts"].dropna().max()
        if pd.notna(batch_max):
            last_ts = batch_max if last_ts is None else max(last_ts, batch_max)
    state.update((n, total, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "last_ts": [last_ts],
        }
    )


def running_user_profiles(events: DataFrame) -> DataFrame:
    """Streaming keyed state: events(ts, user_id, value) -> continuously
    updated per-user profile rows."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- transformWithState (state API v2, Spark 4.0+) ---------------------------
# Same running-profile semantics as running_user_profiles, on the modern
# StatefulProcessor API: composable typed state (ValueState here; ListState/
# MapState and event-time timers available on the same handle), state schema
# evolution, and per-key TTL — the API a new stateful operator should target.

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)


class _ProfileProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "profile", "n long, total double, last_us long"
        )

    def handleInputRows(self, key, rows, timerValues):
        n, total, last_us = self._state.get() if self._state.exists() else (0, 0.0, None)
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            # dropna BEFORE astype: NaT.astype(int64) is Long.MIN, which
            # would silently poison the max for an all-NULL-ts key
            ts_clean = pdf["ts"].dropna()
            if len(ts_clean):
                batch_max = int(ts_clean.astype("int64").max()) // 1000  # ns -> us
                last_us = batch_max if last_us is None else max(last_us, batch_max)
        self._state.update((n, total, last_us))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
                "last_us": [last_us],
            }
        )

    def close(self) -> None:
        pass


def running_user_profiles_v2(events: DataFrame) -> DataFrame:
    """running_user_profiles on the transformWithStateInPandas API —
    identical output contract (last_us as epoch micros instead of a
    timestamp column; the v2 Pandas path hands ts as ns int64).

    Deployment note (ENV-1): the TWS driver worker imports
    google.protobuf at startup; this container ships no protobuf at all
    and installs are off-limits, so the v2 path cannot execute here
    (tests/test_skew_and_state.py xfails on exactly that import). The
    RECOMMENDED operator is running_user_profiles
    (applyInPandasWithState) — same fold, same totals, no protobuf
    dependency; v2 exists for clusters on Spark 4's state API v2 where
    per-state-variable handles and TTL matter."""
    return events.groupBy("user_id").transformWithStateInPandas(
        _ProfileProcessor(),
        outputStructType="user_id long, n_events long, total_value double, last_us long",
        outputMode="Update",
        timeMode="None",
    )
