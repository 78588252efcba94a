"""Structured Streaming operators (filled in M3)."""
