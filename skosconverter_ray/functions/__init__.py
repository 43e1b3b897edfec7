"""Vectorized scalar-function library (SURVEY.md §2.8)."""
