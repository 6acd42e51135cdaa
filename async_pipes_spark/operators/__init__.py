from async_pipes_spark.operators.iterate import iterate, iterate_accumulate  # noqa: F401
