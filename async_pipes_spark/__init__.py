"""async_pipes_spark — a PySpark-native dataflow/analytics engine.

A from-scratch reimplementation of the capabilities of the reference
library ``biewers2/async-pipes`` (a Rust tokio dataflow-pipeline crate,
surveyed in SURVEY.md) on top of Apache Spark:

- The reference's builder API (``Pipeline::builder()`` + ``with_*``,
  reference src/pipeline/builder.rs) is re-expressed as
  :class:`async_pipes_spark.pipeline.PipelineBuilder`, where every
  "pipe" is a named, schema'd DataFrame slot and every "stage" is a
  Catalyst-optimizable DataFrame transformation.
- The reference's runtime (workers/synchronizer/quiescence,
  reference src/pipeline/workers.rs, sync.rs) is replaced wholesale by
  Spark's scheduler; cyclic graphs run as a driver-side fixpoint loop
  (:mod:`async_pipes_spark.operators.iterate`).
- Relational / text / dedup / similarity / multimodal capability beyond
  the reference's raw dataflow surface lives in
  :mod:`async_pipes_spark.functions` and
  :mod:`async_pipes_spark.plans`.

Everything here is built only on public PySpark APIs.
"""

from async_pipes_spark.pipeline import (  # noqa: F401
    NoOutput,
    Pipeline,
    PipelineBuilder,
    PipelineBuildError,
    WorkerOptions,
)
from async_pipes_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
