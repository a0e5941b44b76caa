"""ST6/ST7 — threshold alerting and progress-update throttling.

ST6 (system_metrics.hpp:43-54; notification triggers job_monitor_service
.cpp:876-897, thresholds config.json:108-117): a stateless filter over the
metric stream emitting alert rows — identical in batch and streaming.

ST7 (job_monitor_service.hpp:167-168): emit a progress update only when it
moved ≥ threshold since the *last emitted* update. True last-emitted
semantics are stateful; the batch replay uses the declared lag-compare
(SURVEY §2.9 mapping), and the streaming version keeps per-key state via
``transformWithStateInPandas``-free logic: a lag against the previous
micro-batch is approximated with a watermarked window; exact semantics are
provided by ``throttle_stateful`` below using applyInPandasWithState.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def threshold_alerts(
    metrics: DataFrame,
    *,
    value_col: str = "value",
    warn_at: float = 180.0,
    critical_at: float = 195.0,
) -> DataFrame:
    """ST6 — stateless threshold filter; works on batch or stream."""
    v = F.col(value_col)
    return metrics.filter(v > warn_at).withColumn(
        "severity", F.when(v > critical_at, "critical").otherwise("warning")
    ).withColumn("alert_type", F.lit("RESOURCE_ALERT"))


_THROTTLE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_id", LongType()),
        StructField("value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("last_emitted", DoubleType())])


def _throttle_fn(threshold: float):
    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (last,) = state.get() if state.exists else (None,)
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for row in pdf.itertuples(index=False):
                if last is None or abs(row.value - last) >= threshold:
                    out.append(row)
                    last = float(row.value)
        state.update((last,))
        if out:
            yield pd.DataFrame(out, columns=["user_id", "ts", "event_id", "value"])

    return fn


def throttle_stateful(
    events: DataFrame, threshold: float = 50.0, *, watermark: str = "10 minutes"
) -> DataFrame:
    """ST7 exact semantics on a stream: per-key last-*emitted* value kept in
    the state store (applyInPandasWithState); an update is emitted only when
    it differs from the last emitted one by ≥ threshold.

    The per-group Python loop is inherently sequential (the reference's own
    semantics are a serial scan per job); parallelism comes from the number
    of keys, which is the same scaling story as the state store itself.
    """
    return (
        events.withWatermark("ts", watermark)
        .select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _throttle_fn(threshold),
            outputStructType=_THROTTLE_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
