"""Gap-based sessionization of the ``events`` table -- the standard
behavioral-analytics operator (and the batch twin of Structured
Streaming's ``session_window``).

Semantics match ``F.session_window(ts, gap)``: a session extends
``gap`` past its last event, so an event arriving exactly ``gap``
after the previous one starts a NEW session (split when inactivity
>= gap).

Scale shape: one shuffle on user_id for the ordered window (users are
high-cardinality, so partitions stay balanced), a running SUM over the
same window frame (no second shuffle -- both windows share the
partitioning), then a map-side-combined groupBy on (user, session).
Gap comparison runs on integer microseconds -- exact, engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """One row per (user, session): ordinal session number, start/end
    (second-truncated strings -- the oracle-portable rendering), event
    count, and summed value."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    us = F.unix_micros(F.col(ts_col))
    new_sess = F.when(
        F.lag(us).over(w).isNull() | (us - F.lag(us).over(w) >= gap_us), 1
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged = events.select(
        F.col(user_col),
        F.col(ts_col),
        F.col(order_tiebreak),
        F.col(value_col),
        new_sess.alias("new_sess"),
    ).withColumn("session_no", F.sum("new_sess").over(run))
    return tagged.groupBy(user_col, "session_no").agg(
        F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double").alias("total_value"),
    )
