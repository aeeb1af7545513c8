"""Structured Streaming seam (SURVEY.md §4.4)."""
