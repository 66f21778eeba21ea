"""Streaming surface (SURVEY.md §2.7 ST1-ST4)."""
