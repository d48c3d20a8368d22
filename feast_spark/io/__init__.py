from feast_spark.io.fs import HadoopFS, LocalFS, StoreFS

__all__ = ["StoreFS", "LocalFS", "HadoopFS"]
