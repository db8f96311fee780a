"""Structured Streaming layer: stateful CDC classification, windowed
snapshots, stream-stream correlation, exactly-once sink."""
