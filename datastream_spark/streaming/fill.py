"""Streaming twins of gap filling and time-weighted averaging
(VERDICT r4 item 9 — the round-4 time-series operators were
batch-only; these run the same semantics on an unbounded stream).

Both operators need FUTURE context in batch form (linear fill needs
the next observation; a bucket's TWA needs the segment that bridges
out of it), so neither is watermark-window-expressible. They ARE
cleanly expressible as ``applyInPandasWithState`` machines, because
the append contract makes per-stream timestamps monotonic
(datastream.py append validation): a new observation *finalizes*
everything strictly before it —

- gap fill: when observation ``b_cur`` arrives, every grid bucket in
  ``(b_prev, b_cur]`` is closed: LOCF rows carry ``v_prev``, linear
  rows interpolate between the now-known endpoints. Emission is exactly
  the batch ``fill_gaps`` rows (default per-key bounds), streamed
  incrementally. The batch rows at/before the last seen observation
  and the stream's emitted rows match 1:1 (parity-tested); the batch
  output additionally styles the trailing observed row, which the
  stream also emits, so parity is total.
- TWA: when a point at ``t`` arrives, every bucket whose end is
  ``<= t`` is fully covered by known LOCF segments and is emitted with
  the exact ``sum(v*dt)/sum(dt)`` the batch operator computes. The one
  deliberate difference: the batch operator extends the TRAILING point
  to the end of its own bucket (there is no successor); a stream never
  ends, so the trailing bucket stays open until a later point closes
  it. Parity is therefore exact on all buckets strictly before the
  last point's bucket.

State per stream is O(1) scalars (last point + one open bucket's
accumulator) — the state store stays tiny regardless of volume and the
only shuffle is the per-key grouping of each micro-batch. Late
(non-monotonic) rows are DROPPED rather than corrupting the carry:
the append contract already rejects them upstream
(``validated_stream`` / ``Datastream.append`` monotonicity checks),
so here they can only mean a replayed source — route such sources
through the validated ingest path if drop accounting matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FILL_OUT_SCHEMA = (
    "stream_id string, bucket_epoch long, v_locf double, v_lin double, "
    "filled boolean"
)
FILL_STATE_SCHEMA = "last_b long, last_v double"

TWA_OUT_SCHEMA = (
    "stream_id string, bucket_epoch long, twa double, covered_us long"
)
TWA_STATE_SCHEMA = (
    "last_us long, last_v double, open_b long, acc_vdt double, acc_dt long"
)


def streaming_fill_gaps(
    stream: DataFrame,
    step_seconds: int,
    key: str = "stream_id",
    bucket_col: str = "bucket_epoch",
    value_col: str = "value",
) -> DataFrame:
    """Continuous gap fill: input rows are per-key observations on the
    ``step_seconds`` bucket grid (same contract as batch
    ``fill_gaps``); output densifies every gap the moment its closing
    observation arrives, with BOTH fill methods side by side
    (``v_locf``/``v_lin``) the way the batch q_a8 probe runs them.
    Observed rows re-emit with ``filled=false``."""
    step = step_seconds

    def fn(key_tuple, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        frames = [p for p in pdfs if not p.empty]
        if not frames:
            return
        rows = pd.concat(frames).sort_values(bucket_col)
        bs = rows[bucket_col].to_numpy(dtype="int64")
        vs = rows[value_col].to_numpy(dtype="float64", na_value=np.nan)

        last_b, last_v = state.get if state.exists else (None, None)
        out_b: list[int] = []
        out_locf: list[float] = []
        out_lin: list[float] = []
        out_fill: list[bool] = []
        for b, v in zip(bs, vs):
            b = int(b)
            if last_b is not None and b <= last_b:
                continue  # late/duplicate bucket: monotonic contract
            if last_b is not None:
                for g in range(last_b + step, b, step):
                    out_b.append(g)
                    out_locf.append(last_v)
                    out_lin.append(
                        last_v
                        + (v - last_v) * (g - last_b) / (b - last_b)
                        if last_v is not None and not np.isnan(v)
                        else np.nan
                    )
                    out_fill.append(True)
            out_b.append(b)
            out_locf.append(v if not np.isnan(v) else last_v)
            out_lin.append(v)
            out_fill.append(False)
            if not np.isnan(v):
                last_v = float(v)
            last_b = b
        state.update((last_b, last_v))
        if out_b:
            yield pd.DataFrame(
                {
                    "stream_id": key_tuple[0],
                    "bucket_epoch": np.array(out_b, dtype="int64"),
                    "v_locf": np.array(out_locf, dtype="float64"),
                    "v_lin": np.array(out_lin, dtype="float64"),
                    "filled": np.array(out_fill, dtype="bool"),
                }
            )

    return stream.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=FILL_OUT_SCHEMA,
        stateStructType=FILL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_time_weighted_avg(
    stream: DataFrame,
    step_seconds: int,
    key: str = "stream_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Continuous exact LOCF time-weighted average: emits each grid
    bucket's ``(twa, covered_us)`` the moment a point at-or-past its
    end proves no further segment can touch it. Matches batch
    ``time_weighted_avg`` exactly on every bucket strictly before the
    last point's bucket (the batch trailing-bucket extension has no
    streaming analogue — see module docstring)."""
    step_us = step_seconds * 1_000_000

    def fn(key_tuple, pdfs, state: GroupState):
        import numpy as np
        import pandas as pd

        frames = [p for p in pdfs if not p.empty]
        if not frames:
            return
        rows = pd.concat(frames).sort_values(ts_col)
        us = rows[ts_col].to_numpy(dtype="datetime64[us]").astype("int64")
        vs = rows[value_col].to_numpy(dtype="float64", na_value=np.nan)

        if state.exists:
            last_us, last_v, open_b, acc_vdt, acc_dt = state.get
        else:
            last_us = last_v = open_b = None
            acc_vdt, acc_dt = 0.0, 0
        out_b: list[int] = []
        out_twa: list[float] = []
        out_cov: list[int] = []
        for t, v in zip(us, vs):
            t = int(t)
            if last_us is not None and t <= last_us:
                continue  # monotonic contract: drop, never corrupt
            if last_us is not None:
                b0 = last_us // step_us
                b1 = (t - 1) // step_us
                for b in range(b0, b1 + 1):
                    ov = min(t, (b + 1) * step_us) - max(last_us, b * step_us)
                    if b == open_b:
                        acc_vdt += last_v * ov
                        acc_dt += ov
                    else:
                        # bucket opened fresh by this segment
                        open_b, acc_vdt, acc_dt = b, last_v * ov, ov
                    if (b + 1) * step_us <= t:  # finalized
                        out_b.append(b * step_seconds)
                        out_twa.append(acc_vdt / acc_dt)
                        out_cov.append(acc_dt)
                        open_b, acc_vdt, acc_dt = None, 0.0, 0
            last_us, last_v = t, float(v)
            if open_b is None:
                open_b, acc_vdt, acc_dt = t // step_us, 0.0, 0
        state.update((last_us, last_v, open_b, acc_vdt, acc_dt))
        if out_b:
            yield pd.DataFrame(
                {
                    "stream_id": key_tuple[0],
                    "bucket_epoch": np.array(out_b, dtype="int64"),
                    "twa": np.array(out_twa, dtype="float64"),
                    "covered_us": np.array(out_cov, dtype="int64"),
                }
            )

    return stream.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=TWA_OUT_SCHEMA,
        stateStructType=TWA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_OUT_SCHEMA = "stream_id string, ts timestamp, value double, ewma double"
EWMA_STATE_SCHEMA = "last_y double"


def streaming_ewma(
    stream: DataFrame,
    alpha: float,
    key: str = "stream_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Continuous EWMA: the literal recurrence with the smoothed value
    carried across micro-batches — the streaming twin of
    ``operators.ewma.ewma_exact`` (state is ONE double per stream;
    parity-tested against the batch recurrence row-for-row)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")

    def fn(key_tuple, pdfs, state):
        import pandas as pd

        frames = [p for p in pdfs if not p.empty]
        if not frames:
            return
        rows = pd.concat(frames).sort_values(ts_col)
        (last_y,) = state.get if state.exists else (None,)
        ys = []
        for v in rows[value_col].to_numpy(dtype="float64"):
            last_y = v if last_y is None else alpha * v + (1 - alpha) * last_y
            ys.append(last_y)
        state.update((float(last_y),))
        yield pd.DataFrame(
            {
                "stream_id": key_tuple[0],
                "ts": rows[ts_col].to_numpy(),
                "value": rows[value_col].to_numpy(),
                "ewma": ys,
            }
        )

    return stream.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=EWMA_OUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
