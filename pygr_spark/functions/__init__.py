"""Registered scalar/array functions — the domain function surface
(SURVEY.md §2.8)."""
