from ssiintegrateddatapipeline_spark.streaming.pipeline import (  # noqa: F401
    events_stream,
    last_seen_plan,
    payload_hist_plan,
    run_available_now,
    throughput_plan,
    user_stats_plan,
)
