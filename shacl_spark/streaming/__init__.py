from shacl_spark.streaming.events import (  # noqa: F401
    replay_stream,
    windowed_counts,
    session_windows,
    stateful_dedup,
    run_to_completion,
)
