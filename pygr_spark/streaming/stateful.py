"""Custom stateful streaming: applyInPandasWithState operators
(SURVEY.md §2.9 'applyInPandasWithState for custom stateful
operators').

The flagship example is a streaming gap-merge: pygr's maxgap interval
merge (A5, cnestedlist.pyx:800-840) maintained incrementally per key
as events arrive — the state is the currently-open merged interval,
emitted when a new event starts beyond maxgap (or on timeout). This
is the operator ``session_window`` cannot express when the merge rule
needs custom bounds (maxsize, per-key gap) — exactly the reference's
pluggable ``ivalMethod`` hook (cnestedlist.pyx:801-804).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

MERGED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("start", T.LongType()),
        T.StructField("stop", T.LongType()),
        T.StructField("n_merged", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start", T.LongType()),
        T.StructField("stop", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def streaming_gap_merge(
    events: DataFrame,
    maxgap: int,
    id_col: str = "id",
    pos_col: str = "start",
    timeout_ms: int | None = None,
) -> DataFrame:
    """Incremental per-key gap-merge over a stream of positions.
    Emits a merged interval whenever the key's run is broken by a gap
    > maxgap; the open run is held in GroupState. With ``timeout_ms``
    a processing-time timeout flushes idle keys — note that a bounded
    availableNow run then keeps triggering until every pending timeout
    fires, so batch-style drains should leave it None (open runs stay
    in the checkpoint for the next incarnation, which is the correct
    continuous-pipeline behavior)."""

    def merge(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (kid,) = key
        if state.hasTimedOut:
            if state.exists:
                s, e, n = state.get
                state.remove()
                yield pd.DataFrame(
                    [{"id": kid, "start": s, "stop": e, "n_merged": n}]
                )
            return
        if state.exists:
            cur_s, cur_e, cur_n = state.get
        else:
            cur_s = cur_e = cur_n = None
        out: list[dict] = []
        positions: list[int] = []
        for pdf in pdfs:
            positions.extend(int(x) for x in pdf[pos_col])
        for p in sorted(positions):
            if cur_s is None:
                cur_s, cur_e, cur_n = p, p + 1, 1
            elif p - cur_e > maxgap:
                out.append(
                    {"id": kid, "start": cur_s, "stop": cur_e, "n_merged": cur_n}
                )
                cur_s, cur_e, cur_n = p, p + 1, 1
            else:
                # no-watermark late-data policy: a position that arrives
                # in a later micro-batch below the open run's start still
                # merges (p - cur_e <= maxgap) and must WIDEN the run
                # downward, not just bump the count — [min(s,p), max(e,p+1))
                cur_s, cur_e, cur_n = min(cur_s, p), max(cur_e, p + 1), cur_n + 1
        if cur_s is not None:
            state.update((cur_s, cur_e, cur_n))
            if timeout_ms is not None:
                state.setTimeoutDuration(timeout_ms)
        if out:
            yield pd.DataFrame(out)

    conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy(id_col).applyInPandasWithState(
        merge,
        outputStructType=MERGED_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=conf,
    )
