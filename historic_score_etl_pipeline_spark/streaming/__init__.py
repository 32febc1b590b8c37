from historic_score_etl_pipeline_spark.streaming.jobs import (
    daily_counts_stream,
    read_events_stream,
    run_available_now,
    run_foreach_batch_sink,
    run_incremental_dedup,
    sessionized_stream,
    stateful_sessionizer_stream,
    stateful_user_totals_stream,
    dedup_within_watermark_stream,
    watermarked_dedup_stream,
)

__all__ = [
    "daily_counts_stream",
    "read_events_stream",
    "run_available_now",
    "run_foreach_batch_sink",
    "run_incremental_dedup",
    "sessionized_stream",
    "stateful_sessionizer_stream",
    "stateful_user_totals_stream",
    "dedup_within_watermark_stream",
    "watermarked_dedup_stream",
]
