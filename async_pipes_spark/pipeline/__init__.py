from async_pipes_spark.pipeline.builder import (  # noqa: F401
    NoOutput,
    PipelineBuilder,
    PipelineBuildError,
)
from async_pipes_spark.pipeline.options import WorkerOptions  # noqa: F401
from async_pipes_spark.pipeline.pipeline import Pipeline  # noqa: F401
