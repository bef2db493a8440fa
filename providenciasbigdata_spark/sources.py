"""Production source adapters for the reference's two live stores.

The reference connects a PyMongo client and a Neo4j Bolt driver with
hardcoded credentials (streamlit_app.py:9,14 — see SURVEY.md §0.1); here
the same data arrives through Spark datasource connectors so reads are
distributed, predicate-pushdown-capable, and credential-parameterized.

Both connectors are OPTIONAL runtime dependencies (spark-submit
``--packages org.mongodb.spark:mongo-spark-connector_2.13:10.x`` /
``org.neo4j:neo4j-connector-apache-spark_2.13:5.x``); this container
ships neither, so the read functions are config-gated: they build the
reader and raise ``ConnectorUnavailable`` with the exact package
coordinates if the format is not on the classpath. The fixture-backed
path (io.load_table) is the tested default everywhere else.

Everything short of the wire protocol is a pure, unit-tested function:
option assembly (``mongo_reader_options`` / ``neo4j_reader_options``),
credential redaction for error/log text (``redact_uri``), and the
connector-frame -> engine-schema projections (``docs_from_mongo`` /
``edges_from_neo4j``) which run against fakes with the connectors'
documented output schemas.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MONGO_PACKAGE = "org.mongodb.spark:mongo-spark-connector_2.13:10.4.0"
NEO4J_PACKAGE = "org.neo4j:neo4j-connector-apache-spark_2.13:5.3.0_for_spark_3"

_CREDS_RE = re.compile(r"//[^/@\s]+@")


class ConnectorUnavailable(RuntimeError):
    pass


def redact_uri(uri: str) -> str:
    """Strip any ``user:password@`` userinfo from a connection URI so
    error messages and logs never carry credentials (the reference
    hardcodes both stores' passwords in source — the adapter must not
    even echo them)."""
    return _CREDS_RE.sub("//***@", uri)


def mongo_reader_options(uri: str, database: str, collection: str) -> dict[str, str]:
    """The exact option map handed to ``spark.read.format("mongodb")``
    (connector handles auth via the URI the CALLER supplies — never
    stored, never defaulted in source)."""
    return {
        "connection.uri": uri,
        "database": database,
        "collection": collection,
    }


def neo4j_reader_options(
    url: str,
    username: str,
    password: str,
    relationship: str = "SIMILAR",
    source_labels: str = "Providencia",
    target_labels: str = "Providencia",
) -> dict[str, str]:
    """Option map for the Neo4j connector's relationship-scan mode
    (one row per relationship, flat ``source.*``/``target.*``/``rel.*``
    columns — ``relationship.nodes.map=false``)."""
    return {
        "url": url,
        "authentication.basic.username": username,
        "authentication.basic.password": password,
        "relationship": relationship,
        "relationship.nodes.map": "false",
        "relationship.source.labels": source_labels,
        "relationship.target.labels": target_labels,
    }


def docs_from_mongo(df: DataFrame) -> DataFrame:
    """Connector scan -> the engine's documents-compat schema
    (providencia, tipo, anio int, texto): drop Mongo's ``_id`` (A12
    edge contract — the reference strips it client-side,
    streamlit_app.py:33) and pin ``anio``'s integer type, which schema
    inference can widen to long/double across polymorphic documents."""
    cols = [c for c in df.columns if c != "_id"]
    out = df.select(*cols)
    if "anio" in out.columns:
        out = out.withColumn("anio", F.col("anio").cast("int"))
    return out


def edges_from_neo4j(df: DataFrame) -> DataFrame:
    """Relationship scan -> the engine's edges(src, dst, similitud)
    schema. The connector's flat columns are ``source.providencia`` /
    ``target.providencia`` / ``rel.similitud`` (dots are part of the
    NAME — backtick-quoted, not struct access)."""
    return df.select(
        F.col("`source.providencia`").alias("src"),
        F.col("`target.providencia`").alias("dst"),
        F.col("`rel.similitud`").cast("double").alias("similitud"),
    )


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
    inference and filter pushdown), projected to the engine schema."""
    reader = spark.read.format("mongodb").options(
        **mongo_reader_options(uri, database, collection)
    )
    return docs_from_mongo(_load_or_raise(reader, "mongodb", MONGO_PACKAGE))


def read_neo4j_edges(
    spark: SparkSession,
    url: str,
    username: str,
    password: str,
    relationship: str = "SIMILAR",
) -> DataFrame:
    """Distributed read of the SIMILAR relationship table (reference
    streamlit_app.py:60-64 server-side Cypher -> connector relationship
    scan), projected to edges(src, dst, similitud)."""
    reader = spark.read.format("org.neo4j.spark.DataSource").options(
        **neo4j_reader_options(url, username, password, relationship)
    )
    return edges_from_neo4j(
        _load_or_raise(reader, "org.neo4j.spark.DataSource", NEO4J_PACKAGE)
    )
