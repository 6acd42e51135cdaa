from async_pipes_spark.sources.tables import TABLES, load_table, register_views  # noqa: F401
from async_pipes_spark.sources.files import (  # noqa: F401
    read_csv,
    read_json,
    read_orc,
    read_parquet,
    read_text,
)
from async_pipes_spark.sources.cdc import CHANGE_TYPES, mor_changes  # noqa: F401
from async_pipes_spark.sources.sinks import (  # noqa: F401
    ConcurrentCommitError,
    compact_small_files,
    manifest_version,
    manifest_versions,
    merge_upsert,
    mor_deltas,
    mor_upsert,
    partitioned_manifest_generations,
    purge_tombstones,
    read_manifest_table,
    read_partitioned_manifest,
    read_table,
    restore_manifest_table,
    vacuum_manifest,
    write_bucketed_table,
    write_files,
    write_manifest_table,
    write_partitioned_manifest_table,
)
