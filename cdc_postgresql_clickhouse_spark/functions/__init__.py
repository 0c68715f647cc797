from cdc_postgresql_clickhouse_spark.functions import text

__all__ = ["text"]
