"""Stream-stream joins with event-time bounds.

The reference never joins two streams (its only join semantics run in
Redshift — SURVEY §2.5); this is the Structured Streaming capability
that completes the engine's streaming surface: correlating two live
CDC/event streams (e.g. clicks ⋈ purchases, orders ⋈ shipments)
without landing either one first.

Spark's stream-stream inner join buffers both sides in the state
store; the event-time range condition + watermarks let it evict
buffered rows once no future match is possible, which is what bounds
state at 100 TB: state ≈ rows within the watermark horizon × interval
width, independent of stream length.  Each qualifying pair is emitted
exactly once (append semantics), so the join's OUTPUT is independent
of micro-batch boundaries — which is what makes the gated query
(`events_stream_join`) oracle-checkable against a plain batch join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Inner join of two streams on ``key`` with
    ``left_ts + lower_us <= right_ts <= left_ts + upper_us``
    (bounds in microseconds; ts columns must be TimestampType).

    Both sides get the same watermark delay; the range condition is
    expressed on the timestamp columns directly so Spark's
    StreamingSymmetricHashJoin derives state-eviction bounds from it.
    Columns of both inputs are preserved — disambiguate names before
    calling.
    """
    lw = left.withWatermark(left_ts, watermark_delay)
    rw = right.withWatermark(right_ts, watermark_delay)
    lo = F.expr(f"INTERVAL {lower_us} MICROSECOND")
    hi = F.expr(f"INTERVAL {upper_us} MICROSECOND")
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts] + lo)
        & (rw[right_ts] <= lw[left_ts] + hi)
    )
    return lw.join(rw, cond, "inner").drop(rw[key])
