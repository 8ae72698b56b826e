"""Structured Streaming equivalents of the reference's incremental loop."""
