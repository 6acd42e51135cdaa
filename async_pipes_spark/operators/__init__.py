from async_pipes_spark.operators.asof import asof_join  # noqa: F401
from async_pipes_spark.operators.async_map import async_map_in_pandas  # noqa: F401
from async_pipes_spark.operators.iterate import (  # noqa: F401
    iterate,
    iterate_accumulate,
    iterate_inplace,
)
from async_pipes_spark.operators.partitioning import fan_out  # noqa: F401
from async_pipes_spark.operators.range_join import range_join  # noqa: F401
from async_pipes_spark.operators.skew import salted_aggregate  # noqa: F401
