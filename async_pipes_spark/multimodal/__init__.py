from async_pipes_spark.multimodal.binary import (  # noqa: F401
    MEDIA_SCHEMA,
    bmp_encode,
    extract_features,
    frame_sample,
    resize,
    to_media,
)
