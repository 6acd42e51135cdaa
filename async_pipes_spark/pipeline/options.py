"""Per-stage worker options — API parity with the reference's
``WorkerOptions`` (reference src/pipeline/mod.rs:50-105: pipe_buffer_size
default 30, max_task_count default 100, both validated non-zero).

In the Spark engine these are *advisory*:

- ``max_task_count`` bounds concurrency. For relational stages Spark's
  executor task slots already provide this; for async-I/O pandas stages
  (operators.async_map) it is the per-batch asyncio semaphore limit —
  the direct analogue of the reference's admission control
  (src/pipeline/workers.rs:139).
- ``pipe_buffer_size`` (backpressure) has no batch meaning (pull
  model); for streaming pipes it maps to source rate limits
  (maxFilesPerTrigger / maxOffsetsPerTrigger).
- ``partitions``, Spark-specific: if set, the stage's output is
  repartitioned — the knob that replaces per-stage worker counts when
  sizing for large clusters.
"""

from __future__ import annotations

from dataclasses import dataclass

DEFAULT_MAX_TASK_COUNT = 100
DEFAULT_PIPE_BUFFER_SIZE = 30


@dataclass(frozen=True)
class WorkerOptions:
    pipe_buffer_size: int = DEFAULT_PIPE_BUFFER_SIZE
    max_task_count: int = DEFAULT_MAX_TASK_COUNT
    partitions: int | None = None

    def __post_init__(self):
        if self.pipe_buffer_size <= 0:
            raise ValueError("pipe buffer size must be greater than zero")
        if self.max_task_count <= 0:
            raise ValueError("max task count must be greater than zero")
        if self.partitions is not None and self.partitions <= 0:
            raise ValueError("partitions must be greater than zero")

    @classmethod
    def default_single_task(cls) -> "WorkerOptions":
        return cls(max_task_count=1)

    @classmethod
    def default_multi_task(cls) -> "WorkerOptions":
        return cls(max_task_count=DEFAULT_MAX_TASK_COUNT)
