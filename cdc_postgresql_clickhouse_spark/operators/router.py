"""SMT equivalents: topic routing and multi-table fan-out (survey §2.9).

The reference's Kafka Connect message transforms:

- T2 ``RegexRouter``: topic ``sql_topic.public.(.*)`` → ``$1_changes``
  (``connectors/debezium_configuration.json:50-52``) so topic name == sink
  table name;
- multi-table capture fans one connector out to N sink tables.

Spark form: routing is a column expression; fan-out is a partitioned write
(one job, N output tables) or per-table filtered writes inside
``foreachBatch`` — never N separate scans of the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_PATTERN = r"sql_topic\.public\.(.*)"
DEFAULT_REPLACEMENT = "$1_changes"


def route_topic(
    df: DataFrame,
    topic_col: str = "topic",
    pattern: str = DEFAULT_PATTERN,
    replacement: str = DEFAULT_REPLACEMENT,
) -> DataFrame:
    """T2: rewrite the topic/table name by regex (RegexRouter equivalent)."""
    return df.withColumn("sink_table", F.regexp_replace(F.col(topic_col), pattern, replacement))


def fanout_write(batch_df: DataFrame, base_path: str, table_col: str = "sink_table") -> None:
    """Multi-table fan-out for a (micro-)batch: a single partitioned write —
    one pass over the data, one directory per sink table; the 100 TB form of
    'route each record to its table'. Use inside foreachBatch."""
    batch_df.write.mode("append").partitionBy(table_col).parquet(base_path)
