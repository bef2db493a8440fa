"""Relational-surface queries (SURVEY.md §2.4 "driver" rows). Filled in Phase 3."""

from __future__ import annotations

QUERIES: dict = {}
