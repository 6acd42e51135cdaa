from async_pipes_spark.plans.declared import DECLARED_QUERIES  # noqa: F401
from async_pipes_spark.plans.oracles import DECLARED_ORACLES  # noqa: F401
