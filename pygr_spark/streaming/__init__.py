"""Structured Streaming surface (SURVEY.md §2.9 — new capability; the
reference has only block-buffered pull iteration)."""
