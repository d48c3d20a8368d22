from feast_spark.operators.asof_join import as_of_join, AsOfJoinSpec
from feast_spark.operators.dedup import latest_per_key

__all__ = ["as_of_join", "AsOfJoinSpec", "latest_per_key"]
