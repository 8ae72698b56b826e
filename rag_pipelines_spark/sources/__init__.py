"""Custom sources & sinks: HTML-table scan, JSONL, binary/multimodal."""
