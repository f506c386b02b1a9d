"""Continuous conversion funnels: the streaming twin of
``operators.funnel.funnel`` for live product-analytics feeds.

A funnel is inherently stateful — "earliest step-k event strictly
after step k-1" needs the user's step history — but the state is tiny
and closed-form: one timestamp per step per user. Under the repo's
per-key monotonic-append contract (the same contract every stateful
twin relies on: a user's events arrive in event-time order), the first
qualifying arrival IS the batch min, so the streamed step vector
converges to exactly the batch funnel row; parity is pinned by test.

Scale: state is k longs per user; each micro-batch shuffles by user
only. Emission is UPDATE-shaped — a user re-emits their step vector
whenever a step advances — so downstream consumers keep the latest row
per user (the classic changelog read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_funnel(
    stream: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user funnel state over an unbounded event stream: emits
    (user, step_1_us..step_k_us) whenever a step advances; NULLs past
    the last step reached. Write with ``outputMode("update")``."""
    if len(steps) < 2:
        raise ValueError("streaming_funnel: need at least two steps")
    if len(set(steps)) != len(steps):
        raise ValueError(f"streaming_funnel: duplicate step types in {steps}")
    k = len(steps)
    step_index = {s: i for i, s in enumerate(steps)}
    out_schema = f"{user_col} long, " + ", ".join(
        f"step_{i}_us long" for i in range(1, k + 1)
    )
    state_schema = ", ".join(f"s{i} long" for i in range(1, k + 1))

    def fn(key_tuple, pdfs, state: GroupState):
        import pandas as pd

        st = list(state.get) if state.exists else [None] * k
        frames = [p for p in pdfs if not p.empty]
        if not frames:
            return
        rows = pd.concat(frames).sort_values(ts_col)
        us = rows[ts_col].to_numpy(dtype="datetime64[us]").astype("int64")
        changed = False
        for t_us, ty in zip(us, rows[type_col].tolist()):
            idx = step_index.get(ty)
            if idx is None or st[idx] is not None:
                continue
            if idx == 0 or (st[idx - 1] is not None and t_us > st[idx - 1]):
                st[idx] = int(t_us)
                changed = True
        state.update(tuple(st))
        if changed:
            yield pd.DataFrame(
                [
                    {
                        user_col: key_tuple[0],
                        **{f"step_{i + 1}_us": st[i] for i in range(k)},
                    }
                ]
            )

    return (
        stream.select(user_col, type_col, ts_col)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
