"""Training-data-pipeline queries (SURVEY.md §2.5 C-X). Filled in Phase 4."""

from __future__ import annotations

QUERIES: dict = {}
