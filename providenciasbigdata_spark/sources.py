"""Production source adapters for the reference's two live stores.

The reference connects a PyMongo client and a Neo4j Bolt driver with
hardcoded credentials (streamlit_app.py:9,14 — see SURVEY.md §0.1); here
the same data arrives through Spark datasource connectors so reads are
distributed, predicate-pushdown-capable, and credential-parameterized.

Both connectors are OPTIONAL runtime dependencies (spark-submit
``--packages org.mongodb.spark:mongo-spark-connector_2.13:10.x`` /
``org.neo4j:neo4j-connector-apache-spark_2.13:5.x``); this container
ships neither, so these functions are config-gated: they build the
reader and raise ``ConnectorUnavailable`` with the exact package
coordinates if the format is not on the classpath. The fixture-backed
path (io.load_table) is the tested default everywhere else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

MONGO_PACKAGE = "org.mongodb.spark:mongo-spark-connector_2.13:10.4.0"
NEO4J_PACKAGE = "org.neo4j:neo4j-connector-apache-spark_2.13:5.3.0_for_spark_3"


class ConnectorUnavailable(RuntimeError):
    pass


def _load_or_raise(reader, fmt: str, package: str) -> DataFrame:
    try:
        return reader.load()
    except Exception as e:  # AnalysisException: DATA_SOURCE_NOT_FOUND, etc.
        if "DATA_SOURCE_NOT_FOUND" in str(e) or "Failed to find" in str(e):
            raise ConnectorUnavailable(
                f"Spark datasource {fmt!r} is not on the classpath; launch with "
                f"--packages {package}"
            ) from e
        raise


def read_mongo_collection(
    spark: SparkSession, uri: str, database: str, collection: str
) -> DataFrame:
    """Distributed read of the rulings collection (reference A1:
    streamlit_app.py:19-22 client handle -> connector scan with schema
    inference and filter pushdown). Credentials live in the URI the
    CALLER supplies — never in source."""
    reader = (
        spark.read.format("mongodb")
        .option("connection.uri", uri)
        .option("database", database)
        .option("collection", collection)
    )
    return _load_or_raise(reader, "mongodb", MONGO_PACKAGE)


def read_neo4j_edges(
    spark: SparkSession,
    url: str,
    username: str,
    password: str,
    relationship: str = "SIMILAR",
) -> DataFrame:
    """Distributed read of the SIMILAR relationship table (reference
    streamlit_app.py:60-64 server-side Cypher -> connector relationship
    scan). Project to the engine's edges(src, dst, similitud) schema
    with compat.graph column names downstream."""
    reader = (
        spark.read.format("org.neo4j.spark.DataSource")
        .option("url", url)
        .option("authentication.basic.username", username)
        .option("authentication.basic.password", password)
        .option("relationship", relationship)
        .option("relationship.source.labels", "Providencia")
        .option("relationship.target.labels", "Providencia")
    )
    return _load_or_raise(reader, "org.neo4j.spark.DataSource", NEO4J_PACKAGE)
