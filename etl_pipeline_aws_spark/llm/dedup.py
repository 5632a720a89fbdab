"""Placeholder — filled in by build stage (SURVEY.md §7)."""
