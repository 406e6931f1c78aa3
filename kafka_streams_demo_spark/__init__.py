"""kafka_streams_demo_spark — a PySpark-native streaming/analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference ``hosnimed/kafka-streams-demo`` (Kafka Streams DSL + Processor API
examples), re-expressed Spark-first: the fluent KStream/KTable API compiles
directly to DataFrame operations so Catalyst/Tungsten pick the physical plan.

Layout:
- ``session``     — tuned SparkSession factory (AQE, Arrow, shuffle sizing)
- ``operators``   — KStream / KTable / grouped / windowed / join operators
- ``sources``     — source & sink registry (parquet/csv/kafka/rate), fixtures
- ``functions``   — scalar function layer + text / dedup / similarity /
                    multimodal libraries for large-scale data pipelines
- ``streaming``   — streaming lifecycle, processor (stateful UDF) surface
- ``plans``       — plan-introspection helpers (pushdown/broadcast asserts)
"""

from kafka_streams_demo_spark.session import get_spark
from kafka_streams_demo_spark.operators.kstream import KStream
from kafka_streams_demo_spark.operators.ktable import KTable
from kafka_streams_demo_spark.operators.asof import asof_join
from kafka_streams_demo_spark.operators.grouped import cogroup, suppress

__all__ = ["get_spark", "KStream", "KTable", "asof_join", "cogroup", "suppress"]
__version__ = "0.1.0"
