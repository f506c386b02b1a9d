"""Continuous derive operators: per-stream stateful transforms on an
unbounded stream (SURVEY.md §2.5 W5 — the reference propagates derived
streams incrementally on every append, mongodb.py:_process_contributes_to
~1450 [MED]; here the stream-processing runtime owns the loop).

``applyInPandasWithState`` is the Structured Streaming escape hatch for
operators that need explicit cross-batch state — a lag() has no meaning
on an unbounded stream, so the "previous datapoint" lives in the state
store, keyed by stream, checkpointed with the query. Batch parity: the
emitted rates are exactly ``operators.derive.derivative`` over the same
rows (verified in tests), because the state carries the same (ts, value)
pair a lag window would read.

Scale notes: state is two scalars per stream — the state store stays
tiny regardless of event volume; grouping shuffles each micro-batch by
stream_id only (narrow rows). Arrow moves batches to Python; the kernel
is vectorized numpy over each group's rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DERIV_OUT_SCHEMA = "stream_id string, ts timestamp, value_rate double"
DERIV_STATE_SCHEMA = "last_us long, last_value double"
CRESET_OUT_SCHEMA = "stream_id string, ts timestamp, reset int"
CRESET_STATE_SCHEMA = "last_value double"


def streaming_derivative(
    stream: DataFrame,
    key: str = "stream_id",
    value: str = "value",
    ts: str = "ts",
) -> DataFrame:
    """W2 as a continuous query: dv/dt between consecutive datapoints of
    each stream, with the previous point carried across micro-batches in
    the state store. First point of a stream emits nothing; null values
    reset the pair (batch-twin semantics)."""

    def fn(key_tuple, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        last_us, last_value = state.get if state.exists else (None, None)
        frames = [p for p in pdfs if not p.empty]
        if not frames:
            return
        rows = pd.concat(frames).sort_values(ts)
        us = rows[ts].to_numpy(dtype="datetime64[us]").astype("int64")
        vals = rows[value].to_numpy(dtype="float64", na_value=np.nan)

        prev_us = np.concatenate(([np.nan if last_us is None else last_us], us[:-1]))
        prev_v = np.concatenate(
            ([np.nan if last_value is None else last_value], vals[:-1])
        )
        rate = (vals - prev_v) / ((us - prev_us) / 1_000_000.0)
        # finite only: dt==0 divides to ±inf here but to NULL in the
        # batch twin (Spark non-ANSI divide-by-zero) — drop both ways
        keep = np.isfinite(rate)

        # State: the newest (ts, value) pair — None value resets, like
        # the batch lag() reading a null.
        new_last_v = vals[-1]
        state.update((int(us[-1]), None if np.isnan(new_last_v) else float(new_last_v)))

        if keep.any():
            yield pd.DataFrame(
                {
                    "stream_id": key_tuple[0],
                    "ts": rows[ts].to_numpy()[keep],
                    "value_rate": rate[keep],
                }
            )

    return stream.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=DERIV_OUT_SCHEMA,
        stateStructType=DERIV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_counter_reset(
    stream: DataFrame,
    key: str = "stream_id",
    value: str = "value",
    ts: str = "ts",
) -> DataFrame:
    """W3 as a continuous query: emit 1 whenever a stream's counter
    decreases, with the previous value carried across micro-batches.
    Null semantics mirror the batch lag(): a null value never compares
    (emits nothing) and becomes the carried previous value, so the NEXT
    point cannot compare either — exactly what lag() over the raw rows
    produces (``operators.derive.counter_reset``)."""

    def fn(key_tuple, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        (last_value,) = state.get if state.exists else (None,)
        frames = [p for p in pdfs if not p.empty]
        if not frames:
            return
        rows = pd.concat(frames).sort_values(ts)
        vals = rows[value].to_numpy(dtype="float64", na_value=np.nan)
        prev_v = np.concatenate(
            ([np.nan if last_value is None else last_value], vals[:-1])
        )
        keep = vals < prev_v  # nan on either side compares False

        new_last = vals[-1]
        state.update((None if np.isnan(new_last) else float(new_last),))

        if keep.any():
            yield pd.DataFrame(
                {
                    "stream_id": key_tuple[0],
                    "ts": rows[ts].to_numpy()[keep],
                    "reset": np.ones(int(keep.sum()), dtype="int32"),
                }
            )

    return stream.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=CRESET_OUT_SCHEMA,
        stateStructType=CRESET_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


CDERIV_STATE_SCHEMA = (
    "last_us long, last_value double, last_epoch long, reset_count long"
)


def streaming_counter_derivative(
    stream: DataFrame,
    max_value: float | None = None,
    resets: DataFrame | None = None,
    key: str = "stream_id",
    value: str = "value",
    ts: str = "ts",
) -> DataFrame:
    """W4 as a continuous query: rate of a monotonic counter with
    optional wrap correction, cross-batch state like the other derive
    ops. Batch-twin semantics (``operators.derive.counter_derivative``):
    with ``max_value`` a decrease is a wrap (``delta + max_value``);
    without it negative deltas are discarded; null values break the
    pair both at and after the null.

    ``resets`` is the streaming twin of the batch
    ``apply_reset_stream`` companion: a stream of reset markers (keyed
    to the SAME key values as ``stream`` — alias the reset stream's id
    beforehand, exactly like the batch path). No rate is emitted
    across a reset boundary; a marker at the same ts as a datapoint
    precedes it (the datapoint opens the new segment). State carries
    the running marker count, so a reset straddling two micro-batches
    severs the pair exactly like the batch running-count formulation.
    """
    from pyspark.sql import functions as F

    src = stream.select(
        F.col(key), F.col(ts), F.col(value).cast("double").alias(value),
        F.lit(0).alias("_is_reset"),
    )
    if resets is not None:
        src = src.unionByName(
            resets.select(
                F.col(key), F.col(ts),
                F.lit(None).cast("double").alias(value),
                F.lit(1).alias("_is_reset"),
            )
        )

    def fn(key_tuple, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        last_us, last_value, last_epoch, reset_count = (
            state.get if state.exists else (None, None, None, 0)
        )
        frames = [p for p in pdfs if not p.empty]
        if not frames:
            return
        rows = pd.concat(frames).sort_values(
            [ts, "_is_reset"], ascending=[True, False]
        )
        is_reset = rows["_is_reset"].to_numpy() == 1
        epoch_all = (reset_count or 0) + np.cumsum(is_reset)
        new_reset_count = int(epoch_all[-1]) if len(epoch_all) else reset_count

        vrows = rows[~is_reset]
        if vrows.empty:
            state.update((last_us, last_value, last_epoch, new_reset_count))
            return
        us = vrows[ts].to_numpy(dtype="datetime64[us]").astype("int64")
        vals = vrows[value].to_numpy(dtype="float64", na_value=np.nan)
        epochs = epoch_all[~is_reset]
        prev_us = np.concatenate(([np.nan if last_us is None else last_us], us[:-1]))
        prev_v = np.concatenate(
            ([np.nan if last_value is None else last_value], vals[:-1])
        )
        prev_epoch = np.concatenate(
            ([np.nan if last_epoch is None else last_epoch], epochs[:-1])
        )
        same_epoch = epochs == prev_epoch  # nan carry compares False

        delta = vals - prev_v
        if max_value is not None:
            wrapped = same_epoch & (vals < prev_v)  # nan compares False
            delta = np.where(wrapped, delta + float(max_value), delta)
        with np.errstate(divide="ignore", invalid="ignore"):
            rate = delta / ((us - prev_us) / 1_000_000.0)
        keep = np.isfinite(rate) & same_epoch
        if max_value is None:
            keep &= delta >= 0

        new_last = vals[-1]
        state.update(
            (
                int(us[-1]),
                None if np.isnan(new_last) else float(new_last),
                int(epochs[-1]),
                new_reset_count,
            )
        )

        if keep.any():
            yield pd.DataFrame(
                {
                    "stream_id": key_tuple[0],
                    "ts": vrows[ts].to_numpy()[keep],
                    "value_rate": rate[keep],
                }
            )

    return src.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=DERIV_OUT_SCHEMA,
        stateStructType=CDERIV_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
