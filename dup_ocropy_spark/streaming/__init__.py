"""Structured Streaming variant of the extraction pipeline."""

from dup_ocropy_spark.streaming.extract_stream import (
    extracted_stream, start_extract_stream, windowed_throughput,
)

__all__ = ["extracted_stream", "start_extract_stream", "windowed_throughput"]
