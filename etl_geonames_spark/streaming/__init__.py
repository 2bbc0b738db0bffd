from etl_geonames_spark.streaming.pipeline import (
    geonames_pits_stream,
    read_events_stream,
    read_upsert_state,
    run_available_now,
    streaming_dedup,
    streaming_enrich,
    streaming_interval_join,
    streaming_running_totals,
    streaming_session,
    streaming_tumbling,
    streaming_rollup_maintenance,
    streaming_upsert,
)

__all__ = [
    "geonames_pits_stream",
    "read_events_stream",
    "read_upsert_state",
    "run_available_now",
    "streaming_dedup",
    "streaming_enrich",
    "streaming_interval_join",
    "streaming_running_totals",
    "streaming_session",
    "streaming_tumbling",
    "streaming_rollup_maintenance",
    "streaming_upsert",
]
