"""Operator layer: KStream / KTable fluent API compiled to DataFrame ops.

One operator layer serves batch and streaming — the expressions are
identical; only sources/sinks and output modes differ (Structured
Streaming's unified API). Nothing here executes anything: every method
builds a Catalyst logical plan and lets the optimizer choose the physical
strategy.
"""

from kafka_streams_demo_spark.operators.kstream import KStream
from kafka_streams_demo_spark.operators.ktable import KTable
from kafka_streams_demo_spark.operators.windows import (
    JoinWindows,
    SessionWindows,
    TimeWindows,
)

__all__ = ["KStream", "KTable", "TimeWindows", "SessionWindows", "JoinWindows"]
