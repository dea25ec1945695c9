"""Fronthaul split formats (RU <-> L1 functional split, SURVEY.md C7)."""
