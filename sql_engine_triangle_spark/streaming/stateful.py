"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.10: the engine's extension mechanism for operators the
built-in surface can't express).

Running per-user totals: state = (n_events, sum_value) per user_id,
updated per micro-batch, emitted in update mode. At scale, state
lives in the state store partitioned by user_id — memory is bounded
by |users|, not |events|.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "sum_value": [s]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Stateful running (n_events, sum_value) per user over a stream."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Timeout-based sessionization — the second shape the custom-stateful
# surface must cover (the first, running totals above, never expires
# state; sessions both MERGE state across micro-batches and EXPIRE it
# via event-time timeouts).
# ---------------------------------------------------------------------------

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
        StructField("closed_by_timeout", LongType()),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min, matching j_interval/w_sessionize


def _session_update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key

    def row(start: int, end: int, n: int, s: float, by_timeout: int) -> dict:
        return {
            "user_id": user_id,
            "session_start_us": start,
            "session_end_us": end,
            "n_events": n,
            "sum_value": s,
            "closed_by_timeout": by_timeout,
        }

    if state.hasTimedOut:
        # Watermark passed last_event + gap with no new events: the
        # open session is final. Emit and drop the state.
        start, last, n, s = state.get
        state.remove()
        yield pd.DataFrame([row(start, last, n, s, 1)])
        return

    events = pd.concat(list(pdfs), ignore_index=True)
    vals = events.assign(_us=events["ts"].astype("int64") // 1000).sort_values("_us")

    if state.exists:
        start, last, n, s = state.get
    else:
        start = last = -1
        n, s = 0, 0.0

    closed: list[dict] = []
    for us, v in zip(vals["_us"], vals["value"]):
        us = int(us)
        if start < 0:
            start, last, n, s = us, us, 1, float(v)
        elif us - last > SESSION_GAP_US:
            closed.append(row(start, last, n, s, 0))
            start, last, n, s = us, us, 1, float(v)
        else:
            last, n, s = us, n + 1, s + float(v)
    state.update((start, last, n, s))
    # Expire the open session once the event-time watermark passes
    # last + gap (ms granularity for the state API).
    state.setTimeoutTimestamp(last // 1000 + SESSION_GAP_US // 1000)
    if closed:
        yield pd.DataFrame(closed)


def sessionize_with_timeout(events: DataFrame) -> DataFrame:
    """Custom stateful sessionizer: 30-min-gap sessions per user with
    event-time-timeout state expiry — the applyInPandasWithState shape
    that BOTH merges state across micro-batches (a session spanning
    two batches is one session) and expires it (watermark > last+gap
    closes the session with no further input; ``closed_by_timeout``
    records which path emitted it).

    Differs from the built-in ``session_window`` aggregation (windows.
    py, driver entry stream_session_windows) in that the handler owns
    the state machine — the point of the extension surface: arbitrary
    per-key logic (e.g. emitting mid-session milestones, value-
    dependent gaps) that the built-in merge cannot express. State is
    one (start, last, n, sum) tuple per ACTIVE user — bounded by live
    keys, and the timeout is what bounds 'live': at 100 TB the state
    store holds only users seen within one gap of the watermark.

    Semantics twin (tested): closed sessions == the batch
    gaps-and-islands sessionization (w_sessionize's lag+cumsum form at
    the same gap) minus each user's final session, which only closes
    via timeout once the watermark passes it."""
    return (
        events.select("user_id", "ts", "value")
        .withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_update,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Integer-exact streaming EMA — the stateful twin of the batch
# w_ema_int entry: same integer-cents recurrence, state = (n, ema),
# so a stream whose micro-batches respect event-time order replays
# the batch fold bit-for-bit.
# ---------------------------------------------------------------------------

EMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("ema_cents", LongType()),
    ]
)

EMA_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("ema_cents", LongType()),
    ]
)


def _ema_update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import numpy as np

    (user_id,) = key
    n, ema = state.get if state.exists else (0, 0)
    events = pd.concat(list(pdfs), ignore_index=True)
    events = events.assign(
        _us=events["ts"].astype("int64") // 1000
    ).sort_values(["_us", "event_id"])
    cents = np.floor(events["value"].to_numpy() * 100 + 0.5).astype("int64")
    for c in cents:
        # Python // == Spark `div` == DuckDB `//` on the positive
        # operands this recurrence produces (w_ema_int discipline).
        ema = int(c) if n == 0 else (85 * ema + 15 * int(c)) // 100
        n += 1
    state.update((n, ema))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "ema_cents": [ema]}
    )


def running_user_ema(events: DataFrame) -> DataFrame:
    """Stateful integer-cents EMA per user (85/15 damping): state is
    two longs per user, updated per micro-batch in (ts, event_id)
    order. Correct whenever micro-batch boundaries respect event-time
    order per key (file-per-time-slice sources) — the same in-order
    contract every streaming EMA assumes; cross-batch equality with
    the batch fold is pinned in tests/test_engine_facade.py."""
    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _ema_update,
            outputStructType=EMA_OUTPUT_SCHEMA,
            stateStructType=EMA_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


CUSUM_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_days_closed", LongType()),
        StructField("s", LongType()),
        StructField("cusum_max", LongType()),
        StructField("n_alarms", LongType()),
    ]
)

CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("cur_day", LongType()),
        StructField("day_cents", LongType()),
        StructField("n_days_closed", LongType()),
        StructField("s", LongType()),
        StructField("cusum_max", LongType()),
        StructField("n_alarms", LongType()),
    ]
)


def running_cusum_monitor(
    events: DataFrame, targets: dict[str, int]
) -> DataFrame:
    """Streaming twin of ``w_cusum_drift``: one-sided CUSUM (Page's
    test) per event type over DAILY revenue totals, with a FIXED
    per-type reference target μ0 (slack μ0 div 50, threshold μ0
    div 8 — the batch entry's constants). The batch form derives μ
    from the whole series; a live monitor cannot, so μ0 is the
    supplied reference (trained on history) — exactly how CUSUM is
    deployed. State per type: the OPEN day's accumulator plus the
    fold state (s, smax, alarms) over CLOSED days; a day closes when
    a later day's first event arrives (the in-order micro-batch
    contract of running_user_ema), so after the final batch the
    state equals the batch CUSUM fold over all closed days
    bit-exactly — pinned under arbitrary chunking in
    tests/test_engine_facade.py. At 100 TB: state is six longs per
    monitored series in the state store, the streaming counterpart
    of the batch entry's per-series O(days) argument."""

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        (event_type,) = key
        target = int(targets.get(event_type, 0))
        slack, thresh = target // 50, target // 8
        if state.exists:
            cur_day, day_cents, n_closed, s, smax, alarms = state.get
        else:
            cur_day, day_cents, n_closed, s, smax, alarms = (-1, 0, 0, 0, 0, 0)
        ev = pd.concat(list(pdfs), ignore_index=True)
        ev = ev.assign(_us=ev["ts"].astype("int64") // 1000).sort_values(
            ["_us", "event_id"]
        )
        cents = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype("int64")
        # epoch day, not day-of-month (ADVICE r8): matches the batch
        # twin's unix_date keying so batch==stream equivalence holds on
        # streams spanning multiple months, not just the single-month
        # fixture (day-of-month would close-and-reopen "day N" once per
        # month while the batch fold merges them).
        days = (ev["_us"].to_numpy() // 86_400_000_000).astype("int64")
        for day, c in zip(days, cents):
            day = int(day)
            if cur_day == -1:
                cur_day, day_cents = day, 0
            elif day != cur_day:
                s = max(0, s + day_cents - target - slack)
                smax = max(smax, s)
                alarms += 1 if s > thresh else 0
                n_closed += 1
                cur_day, day_cents = day, 0
            day_cents += int(c)
        state.update((cur_day, day_cents, n_closed, s, smax, alarms))
        yield pd.DataFrame(
            {
                "event_type": [event_type],
                "n_days_closed": [n_closed],
                "s": [s],
                "cusum_max": [smax],
                "n_alarms": [alarms],
            }
        )

    return (
        events.select("event_type", "ts", "event_id", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=CUSUM_OUTPUT_SCHEMA,
            stateStructType=CUSUM_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


HOLT_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_days_closed", LongType()),
        StructField("level_cents", LongType()),
        StructField("trend_cents", LongType()),
        StructField("forecast_5d_cents", LongType()),
        StructField("sum_abs_err_cents", LongType()),
    ]
)

HOLT_STATE_SCHEMA = StructType(
    [
        StructField("cur_day", LongType()),
        StructField("day_cents", LongType()),
        StructField("n_days_closed", LongType()),
        StructField("lvl", LongType()),
        StructField("trd", LongType()),
        StructField("sae", LongType()),
    ]
)


def _tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero division: Spark `div` == DuckDB `//`;
    Python's // floors, which differs on negative trends."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def running_holt_monitor(events: DataFrame) -> DataFrame:
    """Streaming twin of ``w_holt_linear_int``: Holt linear-trend
    smoothing (alpha = beta = 1/4, integer cents, truncating
    division) per event type over DAILY revenue totals, with the
    running sum of absolute one-step-ahead forecast errors. State
    per type: the OPEN day's accumulator plus (level, trend, error
    sum) over CLOSED days — a day closes when a later day's first
    event arrives (the in-order micro-batch contract of
    running_user_ema / running_cusum_monitor), so after the final
    batch the state equals the batch Holt fold over all closed days
    BIT-EXACTLY (the fold is the same Python integer recursion the
    batch oracle twins are pinned against) — chunking-invariance
    fuzzed in tests/test_engine_facade.py including splits cutting a
    day in half. Initialization matches the batch entry: the FIRST
    closed day sets level = x1, trend = 0 (n_days_closed == 0 is the
    uninitialized marker). At 100 TB: state is six longs per
    monitored series — the forecasting counterpart of the CUSUM
    monitor's drift state, and together they are the
    forecast-plus-tracking-signal pair a production monitor keeps."""

    def update(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        (event_type,) = key
        if state.exists:
            cur_day, day_cents, n_closed, lvl, trd, sae = state.get
        else:
            cur_day, day_cents, n_closed, lvl, trd, sae = (-1, 0, 0, 0, 0, 0)
        ev = pd.concat(list(pdfs), ignore_index=True)
        ev = ev.assign(_us=ev["ts"].astype("int64") // 1000).sort_values(
            ["_us", "event_id"]
        )
        cents = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype("int64")
        days = (ev["_us"].to_numpy() // 86_400_000_000).astype("int64")

        def close_day(x: int) -> None:
            nonlocal n_closed, lvl, trd, sae
            if n_closed == 0:
                lvl, trd, sae = x, 0, 0
            else:
                sae += abs(x - lvl - trd)
                l_new = _tdiv(x + 3 * (lvl + trd), 4)
                trd = _tdiv((l_new - lvl) + 3 * trd, 4)
                lvl = l_new
            n_closed += 1

        for day, c in zip(days, cents):
            day = int(day)
            if cur_day == -1:
                cur_day, day_cents = day, 0
            elif day != cur_day:
                close_day(day_cents)
                cur_day, day_cents = day, 0
            day_cents += int(c)
        state.update((cur_day, day_cents, n_closed, lvl, trd, sae))
        yield pd.DataFrame(
            {
                "event_type": [event_type],
                "n_days_closed": [n_closed],
                "level_cents": [lvl],
                "trend_cents": [trd],
                "forecast_5d_cents": [lvl + 5 * trd],
                "sum_abs_err_cents": [sae],
            }
        )

    return (
        events.select("event_type", "ts", "event_id", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            update,
            outputStructType=HOLT_OUTPUT_SCHEMA,
            stateStructType=HOLT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
