from globalweather_etl_spark.operators.surrogate_key import surrogate_key

__all__ = ["surrogate_key"]
