"""Production connector adapters: config-gated error path (the
connectors are not shipped in this runtime — the adapter must fail
with actionable package coordinates, never a bare classpath error)."""

from __future__ import annotations

import pytest

from providenciasbigdata_spark import sources


def test_mongo_adapter_reports_missing_package(spark):
    with pytest.raises(sources.ConnectorUnavailable, match="mongo-spark-connector"):
        sources.read_mongo_collection(
            spark, "mongodb://example.invalid/", "transcripciones", "transcripciones"
        )


def test_neo4j_adapter_reports_missing_package(spark):
    with pytest.raises(sources.ConnectorUnavailable, match="neo4j-connector"):
        sources.read_neo4j_edges(
            spark, "neo4j://example.invalid", "user", "pass"
        )