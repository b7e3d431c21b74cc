"""Structured Streaming semantics tests (SURVEY.md §2.G) — memory sinks.

Rows-only by nature (streaming results aren't DuckDB-oracle-able); the
batch twins in operators/events.py are the oracled surface. These tests
check: windowed aggregation over a file stream, watermark config,
streaming dedup state bounding, and the stateful sessionizer's gap
semantics vs the batch sessionizer.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from pypers_spark.streaming import (
    sessionize_stateful,
    stream_events,
    streaming_dedup,
    streaming_sliding_counts,
    streaming_tumbling_counts,
)


def run_stream_to_memory(stream_df, name, mode="append", timeout=120):
    """Drain a stream into a memory sink and return the result table."""
    query = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert query.awaitTermination(timeout), f"stream {name} did not finish"
    finally:
        query.stop()
    return stream_df.sparkSession.table(name)


@pytest.fixture(scope="module")
def event_stream(spark, sf_dir):
    return stream_events(spark, sf_dir)


def test_tumbling_counts_match_batch(spark, sf_dir, tables, event_stream):
    result = run_stream_to_memory(
        streaming_tumbling_counts(event_stream), "t_tumbling", mode="complete"
    ).toPandas()
    assert len(result) > 0
    assert set(result.columns) == {
        "window_start", "window_end", "event_type", "n_events", "approx_users",
    }
    # Totals equal the batch count (complete mode, no late drops at rest).
    assert result["n_events"].sum() == tables["events"].count()


def test_sliding_windows_overlap(spark, event_stream):
    result = run_stream_to_memory(
        streaming_sliding_counts(event_stream, window="1 hour", slide="30 minutes"),
        "t_sliding",
        mode="complete",
    ).toPandas()
    assert len(result) > 0
    # An event falls into window/slide = 2 overlapping windows, so the
    # sum over window rows must exceed the per-user event count.
    one_user = result.groupby("user_id")["n_events"].sum()
    assert one_user.max() >= 2


def test_streaming_dedup_drops_duplicates(spark, sf_dir, tables, event_stream):
    # The raw events table may contain exact duplicates; union the
    # stream with itself is not possible at rest, so dedup the stream
    # and compare against batch distinct.
    result = run_stream_to_memory(
        streaming_dedup(event_stream, keys=("user_id", "event_type", "ts")),
        "t_dedup",
    ).toPandas()
    batch_distinct = (
        tables["events"].select("user_id", "event_type", "ts").distinct().count()
    )
    assert len(result) == batch_distinct


def test_stateful_sessionizer_gap_semantics(spark, sf_dir, tables, event_stream):
    sessions = run_stream_to_memory(
        sessionize_stateful(event_stream, gap_minutes=30), "t_sessions"
    ).toPandas()
    # Sessions close on a silence gap mid-stream, or via event-time
    # timeout once the watermark passes the gap horizon.
    assert set(sessions["closed_by"]) <= {"gap", "timeout"}
    assert len(sessions) > 0

    from pypers_spark.operators.events import ev_sessionize

    batch = ev_sessionize({"events": tables["events"]}).toPandas()
    # Every emitted streaming session exists in the batch sessionization
    # (same user, same start, same event count).
    merged = sessions.merge(
        batch,
        left_on=["user_id", "n_events"],
        right_on=["user_id", "n_events"],
        how="left",
        indicator=True,
    )
    assert (merged["_merge"] == "both").mean() > 0.95


def test_watermark_present_in_plan(event_stream):
    stream = streaming_tumbling_counts(event_stream, watermark="2 hours")
    assert "watermark" in stream._jdf.queryExecution().analyzed().toString().lower()


def test_stream_static_join(spark, sf_dir, tables, event_stream):
    """Streaming events enrich against a static dimension (per-user event
    totals joined to nothing heavier than a batch-side aggregate)."""
    from pyspark.sql import functions as F

    user_types = tables["events"].groupBy("user_id").agg(
        F.countDistinct("event_type").alias("n_types")
    )
    enriched = event_stream.join(user_types, "user_id")
    result = run_stream_to_memory(enriched.groupBy("user_id").count(), "t_enrich", mode="complete")
    assert result.count() == user_types.count()


def test_stream_stream_interval_join_matches_batch(spark, tables, event_stream):
    """Stream-stream interval join emits exactly the pairs the batch
    twin computes (views within 1h before each purchase, same user)."""
    from pypers_spark.streaming import streaming_interval_join

    result = run_stream_to_memory(
        streaming_interval_join(event_stream), "t_interval"
    ).toPandas()
    ev = tables["events"]
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    batch = purchases.join(
        views,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 1 HOUR")),
    )
    assert len(result) == batch.count()
    assert set(zip(result["purchase_id"], result["view_id"])) == {
        (r["purchase_id"], r["view_id"]) for r in batch.collect()
    }


def test_foreach_batch_parquet_sink(spark, sf_dir, event_stream, tmp_path):
    """foreachBatch: arbitrary batch sinks from a stream (partitioned
    parquet per micro-batch via the library sink)."""
    from pypers_spark.sources import write_parquet

    out = str(tmp_path / "stream_out")

    def sink(batch_df, batch_id):
        write_parquet(batch_df, f"{out}/b{batch_id}", partition_by=["event_type"])

    query = (
        event_stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        assert query.awaitTermination(120)
    finally:
        query.stop()
    written = spark.read.parquet(f"{out}/b*")
    assert written.count() == spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert "event_type=view" in str(list((tmp_path / "stream_out").rglob("event_type=*"))[:5])


# -- foreachBatch keyed upsert sink -------------------------------------------


def test_streaming_upsert_parquet_merges_batches(spark, sf_dir, tmp_path):
    """Drain the event stream through the foreachBatch upsert sink with
    the stream SELF-UNIONED (every key arrives at least twice, possibly
    in different micro-batches): the final table must hold exactly one
    row per event_id — the one with the greatest order column — i.e. the
    batch last-write-wins result."""
    from pypers_spark.streaming.core import stream_events, streaming_upsert_parquet

    out = str(tmp_path / "upsert_table")
    stream = stream_events(spark, sf_dir)
    # second copy with bumped value: must WIN over the original
    bumped = stream.withColumn("value", F.col("value") + 1000.0)
    doubled = stream.unionByName(bumped)
    sink = streaming_upsert_parquet(
        doubled, out, key_cols=["event_id"], order_col="value", n_partitions=4
    )
    q = (
        doubled.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    from pypers_spark.sources.registry import load_table

    events = load_table(spark, sf_dir, "events")
    result = spark.read.parquet(out)
    assert result.count() == events.count()  # one row per key
    # every surviving row is the bumped copy
    joined = result.select("event_id", F.col("value").alias("v_got")).join(
        events.select("event_id", (F.col("value") + 1000.0).alias("v_want")),
        "event_id",
    )
    assert joined.filter(F.col("v_got") != F.col("v_want")).count() == 0
    # partition layout: hash-bucketed _pk directories exist
    import os

    assert any(n.startswith("_pk=") for n in os.listdir(out))


def test_streaming_upsert_second_run_updates_in_place(spark, sf_dir, tmp_path):
    """A second drain with shifted values must UPDATE every key (same
    row count, new values) — the table is mutable-by-key, not
    append-only."""
    from pypers_spark.streaming.core import stream_events, streaming_upsert_parquet

    out = str(tmp_path / "upsert_table2")

    def drain(shift: float, ckpt: str) -> None:
        stream = stream_events(spark, sf_dir).withColumn(
            "value", F.col("value") + shift
        )
        sink = streaming_upsert_parquet(
            stream, out, key_cols=["event_id"], order_col="value", n_partitions=4
        )
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    from pypers_spark.sources.registry import load_table

    n = load_table(spark, sf_dir, "events").count()
    drain(0.0, "c1")
    assert spark.read.parquet(out).count() == n
    before = spark.read.parquet(out).agg(F.sum("value")).collect()[0][0]
    drain(500.0, "c2")
    after_df = spark.read.parquet(out)
    assert after_df.count() == n  # updated, not appended
    after = after_df.agg(F.sum("value")).collect()[0][0]
    assert abs((after - before) - 500.0 * n) < 1e-3 * n


def test_streaming_upsert_scan_is_dpp_pruned(spark, tmp_path):
    """The upsert sink's read of the stored table must carry a
    dynamic-partition-pruning subquery on the _pk partition column —
    the plan-side replacement for collecting touched bucket ids to the
    driver. Pins both the plan shape (dynamicpruningexpression in the
    scan's PartitionFilters) and the merge semantics of the pruned
    read (rows superseded by the batch are gone, others intact)."""
    from pypers_spark.streaming.core import streaming_upsert_parquet

    out = str(tmp_path / "dpp_table")
    base = (
        spark.range(1000)
        .select(F.col("id").alias("event_id"), (F.col("id") * 2.0).alias("value"))
        .withColumn("_pk", F.pmod(F.abs(F.hash("event_id")), F.lit(16)))
    )
    base.write.partitionBy("_pk").parquet(out)

    # instantiate the sink to bind key_cols, then use its pruned reader
    streaming_upsert_parquet(base, out, key_cols=["event_id"], order_col="value")
    pruned = streaming_upsert_parquet._pruned_existing
    batch = (
        spark.range(10)
        .select(F.col("id").alias("event_id"), F.lit(9.9).alias("value"))
        .withColumn("_pk", F.pmod(F.abs(F.hash("event_id")), F.lit(16)))
    )
    existing = pruned(spark, out, batch)
    plan = existing._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan, plan[:2000]
    # semantics: only TOUCHED partitions are read (untouched ones are
    # preserved on disk by dynamic partition overwrite, not rewritten),
    # and within them the batch's keys are anti-joined away
    assert existing.filter(F.col("event_id") < 10).count() == 0
    touched_pks = {r["_pk"] for r in batch.select("_pk").distinct().collect()}
    expected = (
        base.filter(F.col("_pk").isin(list(touched_pks)))
        .filter(F.col("event_id") >= 10)
        .count()
    )
    assert existing.count() == expected
