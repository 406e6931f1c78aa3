"""Sources & sinks: testdata loaders, golden fixtures, kafka builders,
Avro serde, topic/table admin."""

from kafka_streams_demo_spark.sources.admin import create_table, drop_table, list_tables
from kafka_streams_demo_spark.sources.avro import from_avro_df, to_avro_df
from kafka_streams_demo_spark.sources.registry import Tables, load_table

__all__ = [
    "Tables", "load_table",
    "from_avro_df", "to_avro_df",
    "create_table", "drop_table", "list_tables",
]
