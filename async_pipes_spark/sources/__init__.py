from async_pipes_spark.sources.tables import TABLES, load_table, register_views  # noqa: F401
from async_pipes_spark.sources.files import (  # noqa: F401
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    read_text,
)
from async_pipes_spark.sources.sinks import write_bucketed_table, write_files  # noqa: F401
