"""Structured Streaming layer: changelog emission, statement execution."""
