from async_pipes_spark.sources.tables import TABLES, load_table, register_views  # noqa: F401
from async_pipes_spark.sources.files import read_csv, read_json, read_parquet  # noqa: F401
from async_pipes_spark.sources.sinks import write_bucketed_table, write_files  # noqa: F401
