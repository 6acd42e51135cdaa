from async_pipes_spark.streaming.run import run_available_now, stream_table  # noqa: F401
from async_pipes_spark.streaming.windows import (  # noqa: F401
    session_windows_stream,
    tumbling_counts_stream,
)
