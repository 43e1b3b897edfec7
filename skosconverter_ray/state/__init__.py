"""Checkpoint / lineage state (SURVEY.md M6)."""
