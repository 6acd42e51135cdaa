from async_pipes_spark.multimodal.binary import (  # noqa: F401
    MEDIA_SCHEMA,
    extract_features,
    to_media,
)
