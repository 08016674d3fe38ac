from docling_metrics_spark.streaming.windowed import (  # noqa: F401
    read_events_stream,
    run_available_now,
    sessionize_stream,
    windowed_event_counts,
)
