"""Structured Streaming wrapper over the compiled constraint DAG."""
