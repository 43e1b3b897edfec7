"""Render sinks (SURVEY.md S4-S8)."""
