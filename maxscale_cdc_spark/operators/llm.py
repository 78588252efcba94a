"""LLM-data-pipeline operators (filled in M4)."""
