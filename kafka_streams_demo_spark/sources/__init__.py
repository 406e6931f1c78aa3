"""Sources & sinks: testdata loaders, golden fixtures, kafka builders."""

from kafka_streams_demo_spark.sources.registry import Tables, load_table

__all__ = ["Tables", "load_table"]
