"""Custom stateful streaming operator via ``applyInPandasWithState``.

``conversation_sessions``: assembles per-conversation running state from a
stream of transcript turns — turn count, analyzed-token count, last event
time — and EMITS a conversation summary row only when the conversation
goes quiet (processing-time timeout). Conversations still open when the
query is STOPPED are retained in the state store, not emitted — they
flush on the next run's timeout after a restart from the checkpoint
(ProcessingTimeTimeout fires only while a query runs; there is no
at-shutdown flush hook). This is the canonical "session window with
custom state" shape that windowed aggregation can't express (the emitted
row depends on accumulated state, not a fixed window).

State flows through Arrow as a single-row pandas DataFrame per key; the
timeout uses ``GroupStateTimeout.ProcessingTimeTimeout`` so idle
conversations flush without new input on the key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n_turns long, n_tokens long, last_ts timestamp"
OUTPUT_SCHEMA = (
    "conv_id string, n_turns long, n_tokens long, last_ts timestamp"
)


def _session_fn(analyzer_name: str, idle_ms: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        from ..analysis.analyzer import get_analyzer

        analyze = get_analyzer(analyzer_name)
        (conv_id,) = key
        if state.hasTimedOut:
            n_turns, n_tokens, last_ts = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "conv_id": conv_id,
                        "n_turns": n_turns,
                        "n_tokens": n_tokens,
                        "last_ts": last_ts,
                    }
                ]
            )
            return
        n_turns, n_tokens, last_ts = (
            state.get if state.exists else (0, 0, None)
        )
        for pdf in pdfs:
            n_turns += len(pdf)
            n_tokens += int(
                sum(len(analyze(t)) for t in pdf["text"] if t is not None)
            )
            batch_max = pdf["ts"].max()
            # an all-null chunk yields NaT; adopting it would poison every
            # later comparison (x > NaT is always False), freezing last_ts
            if not pd.isna(batch_max) and (
                last_ts is None or pd.isna(last_ts) or batch_max > last_ts
            ):
                last_ts = batch_max
        state.update((n_turns, n_tokens, last_ts))
        state.setTimeoutDuration(idle_ms)
        return
        yield  # pragma: no cover - make fn a generator

    return fn


def conversation_sessions(
    stream: DataFrame,
    analyzer: str = "composable",
    idle_ms: int = 30_000,
) -> DataFrame:
    """Streaming: (conv_id, turn_idx, text, ts) -> conversation summaries
    emitted on idle timeout. Input must be a streaming DataFrame."""
    return stream.groupBy("conv_id").applyInPandasWithState(
        _session_fn(analyzer, idle_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
