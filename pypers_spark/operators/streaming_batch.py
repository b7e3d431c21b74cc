"""Structured Streaming inside the correctness gate (SURVEY.md §2.G).

A finite file-source stream processed with ``trigger(availableNow)`` in
COMPLETE output mode produces exactly the batch aggregation result —
deterministically — so the streaming execution path itself (readStream →
watermarked window agg → memory sink) can be value-matched against a
plain-SQL oracle. The other streaming operators (append-mode windows,
dropDuplicatesWithinWatermark, stateful sessionizer, interval join) stay
tests-only in tests/test_streaming.py because their outputs depend on
trigger/watermark timing by design.

Scale note: this is the same code path a production backfill uses —
``availableNow`` drains a bounded backlog with bounded per-batch file
counts, then the same query keeps running incrementally on live data.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pypers_spark.functions.rounding import dsum, duck_dsum, duck_rnd, rnd

QUERIES: dict = {}
ORACLES: dict = {}

_SINK_SEQ = itertools.count()


def st_tumbling_counts(t: dict[str, DataFrame]) -> DataFrame:
    """Hourly event counts + exact value sums per type, computed BY THE
    STREAMING ENGINE: file-source stream (one file per micro-batch) →
    watermarked tumbling window → complete-mode memory sink, drained
    with availableNow. Complete mode keeps all window state, so the
    drained result equals the batch aggregation bit-for-bit — the
    correctness gate covers the streaming runtime, not a batch twin.
    """
    from pypers_spark.streaming.core import stream_events

    spark = t["events"].sparkSession  # also pins UTC + nanosAsLong confs
    stream = stream_events(spark, t._sf_dir)
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            rnd(dsum(F.col("value")), 2).alias("total_value"),
        )
        .select(
            F.col("win.start").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    name = f"st_tumbling_counts_{next(_SINK_SEQ)}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).orderBy("hour_start", "event_type")


ORACLE_ST_TUMBLING = f"""
SELECT date_trunc('hour', ts) AS hour_start, event_type,
       count(*) AS n_events, {duck_rnd(duck_dsum('value'), 2)} AS total_value
FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type
"""

QUERIES["st_tumbling_counts"] = st_tumbling_counts
ORACLES["st_tumbling_counts"] = ORACLE_ST_TUMBLING
