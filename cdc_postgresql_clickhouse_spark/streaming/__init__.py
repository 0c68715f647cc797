from cdc_postgresql_clickhouse_spark.streaming.pipeline import run_cdc_pipeline

__all__ = ["run_cdc_pipeline"]
