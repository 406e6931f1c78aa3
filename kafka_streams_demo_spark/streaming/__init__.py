"""Streaming layer: lifecycle, stateful processors, KTable materialization.

Structured Streaming's unified API means the operator layer (operators/) is
shared between batch and streaming — this package adds the runtime glue the
reference gets from KafkaStreams.start()/close(), state stores, and
punctuators (SURVEY §2h-2i).
"""

from kafka_streams_demo_spark.streaming.lifecycle import (
    clean_up,
    run_available_now,
)
from kafka_streams_demo_spark.streaming.processor import process_with_state

__all__ = ["run_available_now", "clean_up", "process_with_state"]
