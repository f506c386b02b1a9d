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


def streaming_retention_enrich(
    stream: DataFrame,
    period_seconds: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of ``operators.funnel.retention``, split at the
    natural streaming seam: this stage emits ONE append-shaped row
    (user, cohort_epoch, period_offset) per newly-entered activity
    period — state is just (cohort, last emitted period), O(1) per
    user, because monotonic appends mean periods arrive non-decreasing
    — and the batch ``groupBy(cohort, offset).count`` over the emitted
    rows reproduces the retention report exactly (parity-tested).
    Downstream, that count is an ordinary streaming aggregation."""
    if period_seconds < 1:
        raise ValueError("streaming_retention_enrich: period_seconds must be >= 1")
    p = int(period_seconds)
    out_schema = f"{user_col} long, cohort_epoch long, period_offset long"
    state_schema = "cohort long, last_p long"

    def fn(key_tuple, pdfs, state: GroupState):
        import pandas as pd

        cohort, last_p = state.get if state.exists else (None, None)
        frames = [f for f in pdfs if not f.empty]
        if not frames:
            return
        rows = pd.concat(frames).sort_values(ts_col)
        us = rows[ts_col].to_numpy(dtype="datetime64[us]").astype("int64")
        out = []
        for t_us in us:
            period = (int(t_us) // 1_000_000 // p) * p
            if cohort is None:
                cohort = period
            if last_p is None or period > last_p:
                last_p = period
                out.append(
                    {
                        user_col: key_tuple[0],
                        "cohort_epoch": cohort,
                        "period_offset": (period - cohort) // p,
                    }
                )
        state.update((cohort, last_p))
        if out:
            yield pd.DataFrame(out)

    return (
        stream.select(user_col, ts_col)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_top_paths(
    stream: DataFrame,
    k: int = 3,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak: str | None = "event_id",
    sep: str = ">",
) -> DataFrame:
    """Streaming twin of ``operators.funnel.top_paths``' per-user
    prefix: emits (user, path) whenever the user's first-``k``
    event-type prefix grows; the LAST emission per user equals the
    batch prefix (parity-tested), and counting paths across users is
    an ordinary downstream aggregation. State: up to k short strings
    per user; a user past k events costs nothing further.

    ``tiebreak`` must name the same column the batch twin orders by
    when timestamps can repeat — the sort here is STABLE on
    (ts, tiebreak), because an unstable ts-only sort would let
    equal-timestamp events swap between a run and its checkpoint
    replay. Pass ``tiebreak=None`` only when ts is unique per user."""
    if k < 1:
        raise ValueError("streaming_top_paths: k must be >= 1")
    out_schema = f"{user_col} long, path string, path_len int"
    state_schema = "prefix string, n int"
    cols = [user_col, type_col, ts_col] + ([tiebreak] if tiebreak else [])
    sort_cols = [ts_col] + ([tiebreak] if tiebreak else [])

    def fn(key_tuple, pdfs, state: GroupState):
        import pandas as pd

        prefix, n = state.get if state.exists else ("", 0)
        if n >= k:  # prefix complete — nothing can change
            state.update((prefix, n))
            return
        frames = [f for f in pdfs if not f.empty]
        if not frames:
            return
        rows = pd.concat(frames).sort_values(sort_cols, kind="stable")
        grew = False
        for ty in rows[type_col].tolist():
            if n >= k:
                break
            prefix = ty if n == 0 else prefix + sep + ty
            n += 1
            grew = True
        state.update((prefix, n))
        if grew:
            yield pd.DataFrame(
                [{user_col: key_tuple[0], "path": prefix, "path_len": n}]
            )

    return (
        stream.select(*cols)
        .groupBy(user_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_unordered_funnel(
    stream: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of ``operators.funnel.unordered_funnel`` — and
    the degenerate case of the twin family: a set-completion funnel is
    a pure conditional-min aggregation, so it needs NO custom state
    operator. Spark's built-in streaming aggregation maintains the
    per-user k mins in the state store, entirely JVM-side (no Python
    state function, no Arrow hop), and each conditional min only
    ratchets downward as events arrive — the same monotone-state
    argument the ordered twin makes by hand, delivered here by the
    engine. Write with ``outputMode("update")``; the last emission per
    user equals the batch row (parity-tested).

    The batch operator IS the streaming plan: ``unordered_funnel``
    applied to a streaming frame plans as a stateful HashAggregate."""
    from datastream_spark.operators.funnel import unordered_funnel

    return unordered_funnel(
        stream, steps, user_col=user_col, type_col=type_col, ts_col=ts_col
    )


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
