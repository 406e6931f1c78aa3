"""Sources & sinks: testdata loaders, golden fixtures, kafka builders,
Avro serde (+ schema-registry wire format), topic/table admin."""

from kafka_streams_demo_spark.sources.admin import create_table, drop_table, list_tables
from kafka_streams_demo_spark.sources.avro import from_avro_df, to_avro_df
from kafka_streams_demo_spark.sources.registry import Tables, load_table
from kafka_streams_demo_spark.sources.schema_registry import (
    HttpSchemaRegistry,
    InMemorySchemaRegistry,
    from_avro_wire_df,
    to_avro_wire_df,
)

__all__ = [
    "Tables", "load_table",
    "from_avro_df", "to_avro_df",
    "InMemorySchemaRegistry", "HttpSchemaRegistry",
    "to_avro_wire_df", "from_avro_wire_df",
    "create_table", "drop_table", "list_tables",
]
