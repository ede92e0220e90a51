"""Streaming surface tests: bounded runs with availableNow, asserted
against batch equivalents (SURVEY.md §7.3: anchor streaming to batch
equivalence)."""

from pyspark.sql import functions as F

from pygr_spark.streaming.events import (
    read_events_stream,
    run_stream_to_table,
    session_counts,
    tumbling_counts,
)


def test_tumbling_counts_match_batch(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    got = run_stream_to_table(tumbling_counts(stream), spark)

    batch = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "event_time", F.timestamp_micros(F.expr("ts DIV 1000"))
    )
    want = (
        batch.groupBy(F.window("event_time", "5 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("window.start").alias("win_start"), "event_type", "n_events")
    )
    g = {(r.win_start, r.event_type): r.n_events for r in got.collect()}
    w = {(r.win_start, r.event_type): r.n_events for r in want.collect()}
    assert g == w and len(g) > 0


def test_session_counts_run(spark, sf_dir):
    stream = read_events_stream(spark, sf_dir)
    got = run_stream_to_table(session_counts(stream, gap="30 minutes"), spark)
    rows = got.collect()
    assert len(rows) > 0
    # session totals must preserve all events
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert sum(r.n_events for r in rows) == n_events
