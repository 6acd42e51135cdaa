from async_pipes_spark.functions.json import json_get_int  # noqa: F401
from async_pipes_spark.functions.money import dec2, money_sum  # noqa: F401
from async_pipes_spark.functions.vectors import (  # noqa: F401
    cosine_sim_f32,
    dot_f32,
    micro_units,
    norm_f32,
)
