"""Multimodal column operators (filled in M4)."""
