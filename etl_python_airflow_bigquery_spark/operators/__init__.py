"""Reusable relational operators (SURVEY.md §2)."""
