"""Structured Streaming surface (SURVEY §2 Part C, X6)."""
