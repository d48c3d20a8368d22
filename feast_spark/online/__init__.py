from feast_spark.online.store import OnlineStore

__all__ = ["OnlineStore"]
