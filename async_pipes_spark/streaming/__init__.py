from async_pipes_spark.streaming.run import (  # noqa: F401
    once_per_batch,
    run_available_now,
    run_foreach_batch_routes,
    stream_table,
    stream_to_files,
)
from async_pipes_spark.streaming.stateful import stateful_fold_per_user  # noqa: F401
from async_pipes_spark.streaming.windows import (  # noqa: F401
    session_windows_stream,
    sliding_counts_stream,
    tumbling_counts_stream,
)
