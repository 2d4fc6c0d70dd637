"""Custom stateful streaming operator: live per-run progress tracking.

The reference's live-output pattern (ST1, src/blq/bird.py:1052-1109) is
poll-and-reparse — every reader recomputes counts from the whole log.
The stateful Spark form keeps a tiny per-run state (error/warning/total
counts, first/last event line) that is updated incrementally as parsed
events stream in, via ``applyInPandasWithState``:

- state is keyed by run (source_id) — bounded by the number of
  *in-flight* runs, not by event volume, so it holds at 100 TB;
- each micro-batch touches only the keys present in the batch (Arrow
  batches, no per-row Python);
- an idle timeout closes out runs that stopped producing events (the
  streaming analogue of the orphan sweep, ST2).

Output mode is ``update``: each batch emits the refreshed summary row per
touched run — the exact shape a live status dashboard consumes.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PROGRESS_SCHEMA = (
    "source_id string, n_events long, n_errors long, n_warnings long,"
    " first_line int, last_line int, status string"
)
_STATE_SCHEMA = "n_events long, n_errors long, n_warnings long, first_line int, last_line int"


def _update_progress(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        n, ne, nw, fl, ll = state.get
        state.remove()
        yield pd.DataFrame(
            [[key[0], n, ne, nw, fl, ll, "idle-closed"]],
            columns=["source_id", "n_events", "n_errors", "n_warnings",
                     "first_line", "last_line", "status"],
        )
        return

    n, ne, nw, fl, ll = state.get if state.exists else (0, 0, 0, None, None)
    for pdf in pdfs:
        n += len(pdf)
        sev = pdf["severity"]
        ne += int((sev == "error").sum())
        nw += int((sev == "warning").sum())
        lines = pdf["log_line_start"].dropna()
        if len(lines):
            lo, hi = int(lines.min()), int(lines.max())
            fl = lo if fl is None else min(fl, lo)
            ll = hi if ll is None else max(ll, hi)
    state.update((n, ne, nw, fl, ll))
    state.setTimeoutDuration(30_000)
    yield pd.DataFrame(
        [[key[0], n, ne, nw, fl, ll, "running"]],
        columns=["source_id", "n_events", "n_errors", "n_warnings",
                 "first_line", "last_line", "status"],
    )


def run_progress(parsed_events: DataFrame) -> DataFrame:
    """Stateful live-run progress over a stream of parsed events (the
    output of streaming.live.stream_run_logs). One summary row per run
    per batch; idle runs emit a final ``idle-closed`` row and drop their
    state."""
    return parsed_events.groupBy("source_id").applyInPandasWithState(
        _update_progress,
        outputStructType=PROGRESS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
