"""Gap-based sessionization — batch column-op version + a CUSTOM
STATEFUL STREAMING operator (``applyInPandasWithState``).

The brief's Structured-Streaming checklist names custom stateful
operators explicitly; this is the engine's: per-user event sessions
with a configurable inactivity gap.

* ``sessionize_batch`` — pure column expressions (lag → gap break →
  running break-count → group): the whole computation is two window
  passes + one aggregation, all JVM-side; it is also the DuckDB
  oracle's shape, so the driver verifies it bit-exactly
  (``events_sessionize``).
* ``sessionize_stream`` — ``groupByKey(user).applyInPandasWithState``:
  the group state carries the user's OPEN session (start/last/min-id/
  count/value-sum); each micro-batch merges its events in timestamp
  order, EMITS every session that closed (a later event fell beyond
  the gap), and keeps the still-open tail in state. Sessions are
  emitted exactly once; the open tail is observable only by ending
  the stream (the batch operator is the complete view — streaming
  emits the closed prefix).

Scale notes: state is O(1) per active user (6 scalars); a batch's
per-user work is O(events in batch); no timeline is retained. The
stream source must deliver a user's events in non-decreasing
timestamp order across batches (per-partition-ordered sources — file
chunks by time, kafka per-key — satisfy this; the operator raises on
regressions rather than silently mis-sessionizing).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_id", T.LongType()),  # min event_id
        T.StructField("t_start_us", T.LongType()),
        T.StructField("t_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_cents", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.LongType()),
        T.StructField("t_start_us", T.LongType()),
        T.StructField("t_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_cents", T.LongType()),
    ]
)


def sessionize_batch(events: DataFrame, gap_minutes: float = 30.0) -> DataFrame:
    """(user_id, session_id, t_start_us, t_end_us, n_events,
    value_cents) — one row per gap-delimited session."""
    from pyspark.sql import Window

    gap_us = int(gap_minutes * 60_000_000)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = events.select(
        "user_id",
        "event_id",
        "ts",
        # cast: parquet sources read ts as TIMESTAMP_NTZ; the session
        # timezone is pinned UTC so the cast is a pure reinterpretation
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    brk = F.when(
        F.lag("t_us").over(w).isNull()
        | ((F.col("t_us") - F.lag("t_us").over(w)) > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    s = e.withColumn("brk", brk).withColumn(
        "sess", F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return s.groupBy("user_id", "sess").agg(
        F.min("event_id").alias("session_id"),
        F.min("t_us").alias("t_start_us"),
        F.max("t_us").alias("t_end_us"),
        F.count("*").alias("n_events"),
        F.sum("cents").alias("value_cents"),
    ).drop("sess")


def sessionize_stream(events_stream: DataFrame, gap_minutes: float = 30.0) -> DataFrame:
    """Streaming gap sessionization (append mode): emits each session
    when it CLOSES. ``events_stream`` needs (user_id, event_id, ts,
    value) like the events table."""
    gap_us = int(gap_minutes * 60_000_000)

    def fn(
        key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        user = int(key[0])
        if state.exists:
            sid, t0, t1, n, cents = state.get
        else:
            sid = t0 = t1 = n = cents = None
        out = []  # closed-session pdfs
        # Arrow hands a group as MULTIPLE chunks (maxRecordsPerBatch,
        # default 10k) in arbitrary shuffle-read order — sorting per
        # chunk and trusting cross-chunk order mis-sessionizes (or
        # spuriously raises) for any user with >10k events in a batch;
        # a 1M-event bench run caught this (r4). Gather the whole
        # group, sort ONCE, process once. Memory is O(group-per-batch)
        # — the same rows Spark already shuffled to this task; state
        # stays O(1).
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            # r4: vectorized within-batch — gap breaks via np.diff,
            # per-session aggregates via ufunc.reduceat; the Python
            # interpreter touches only the single batch-edge merge
            # with the carried open-session state (was a per-event
            # loop, the one interpreter-bound streaming hot path).
            # r5: only the three needed columns leave pandas — column
            # concatenation + one lexsort over int64 keys replaces the
            # whole-DataFrame pd.concat + sort_values copies.
            tus = np.concatenate([c["t_us"].to_numpy(np.int64) for c in chunks])
            eid = np.concatenate([c["event_id"].to_numpy(np.int64) for c in chunks])
            cts = np.concatenate([c["cents"].to_numpy(np.int64) for c in chunks])
            order = np.lexsort((eid, tus))
            tus = tus[order]
            eid = eid[order]
            cts = cts[order]
            if t1 is not None and int(tus[0]) < t1:
                raise ValueError(
                    f"sessionize_stream: out-of-order event for user {user} "
                    f"({int(tus[0])} < open-session end {t1}) — source must "
                    "be per-user time-ordered across batches"
                )
            # segment starts: index 0 + every position whose gap from
            # the previous event exceeds gap_us
            starts = np.concatenate(
                ([0], np.flatnonzero(np.diff(tus) > gap_us) + 1)
            )
            ends = np.concatenate((starts[1:], [tus.size]))
            s_sid = np.minimum.reduceat(eid, starts)
            s_t0 = tus[starts]
            s_t1 = tus[ends - 1]
            s_n = ends - starts
            s_cents = np.add.reduceat(cts, starts)
            k = starts.size
            # batch-edge merge: open state either absorbs segment 0
            # (within gap) or closes ahead of it
            pre = None
            if t1 is not None:
                if int(s_t0[0]) - t1 <= gap_us:
                    s_sid[0] = min(sid, int(s_sid[0]))
                    s_t0[0] = t0
                    s_n[0] += n
                    s_cents[0] += cents
                else:
                    pre = (sid, t0, t1, n, cents)
            # last segment stays open in state; the rest close
            sid, t0, t1, n, cents = (
                int(s_sid[k - 1]),
                int(s_t0[k - 1]),
                int(s_t1[k - 1]),
                int(s_n[k - 1]),
                int(s_cents[k - 1]),
            )
            n_closed = (k - 1) + (1 if pre is not None else 0)
            if n_closed:
                c_sid = s_sid[: k - 1]
                c_t0 = s_t0[: k - 1]
                c_t1 = s_t1[: k - 1]
                c_n = s_n[: k - 1]
                c_cents = s_cents[: k - 1]
                if pre is not None:
                    c_sid = np.concatenate(([pre[0]], c_sid))
                    c_t0 = np.concatenate(([pre[1]], c_t0))
                    c_t1 = np.concatenate(([pre[2]], c_t1))
                    c_n = np.concatenate(([pre[3]], c_n))
                    c_cents = np.concatenate(([pre[4]], c_cents))
                out.append(
                    pd.DataFrame(
                        {
                            "user_id": np.full(n_closed, user, np.int64),
                            "session_id": c_sid.astype(np.int64),
                            "t_start_us": c_t0.astype(np.int64),
                            "t_end_us": c_t1.astype(np.int64),
                            "n_events": c_n.astype(np.int64),
                            "value_cents": c_cents.astype(np.int64),
                        }
                    )
                )
        if t1 is not None:
            state.update((sid, t0, t1, n, cents))
        yield from out

    prepared = events_stream.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        SESSION_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
