"""Streaming-equivalent batch queries over ``events``. Filled in Phase 4."""

from __future__ import annotations

QUERIES: dict = {}
