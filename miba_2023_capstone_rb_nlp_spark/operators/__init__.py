"""Relational + analytic operators (each maps to a SURVEY.md §2 row)."""
