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


# ---- JDBC (relational stores) ------------------------------------------

# driver coordinates for the common engines — the hint ConnectorUnavailable
# prints; the JDBC *format* is built into Spark, only the driver jar is
# deployment-specific.
JDBC_DRIVERS = {
    "postgresql": "org.postgresql:postgresql:42.7.3",
    "mysql": "com.mysql:mysql-connector-j:8.4.0",
    "sqlserver": "com.microsoft.sqlserver:mssql-jdbc:12.6.1.jre11",
    "oracle": "com.oracle.database.jdbc:ojdbc11:23.4.0.24.05",
}

_PASSWORD_RE = re.compile(r"(?i)(password=)[^&;\s]+")


def redact_jdbc_url(url: str) -> str:
    """JDBC URLs carry credentials two ways — userinfo
    (``//user:pass@host``) and query params (``?password=...``);
    strip both before the URL can reach an error message or log."""
    return _PASSWORD_RE.sub(r"\1***", redact_uri(url))


def jdbc_partition_predicates(
    partition_column: str, lower_bound: int, upper_bound: int, num_partitions: int
) -> list[str]:
    """The explicit partition plan for a parallel JDBC read: N
    non-overlapping predicates over ``partition_column``, handed to
    ``spark.read.jdbc(..., predicates=...)`` so each executor issues
    one bounded query. Contract (matching Spark's own JDBCRelation
    column-partitioning semantics): the FIRST slice is open below and
    claims NULLs, the LAST is open above — rows outside
    [lower_bound, upper_bound) are still read exactly once; the bounds
    only shape the split, never filter.

    Explicit predicates beat the partitionColumn option when the
    column is skewed: the caller can pass quantile boundaries instead
    of the uniform stride this helper derives.
    """
    if num_partitions < 1:
        raise ValueError(f"num_partitions must be >= 1, got {num_partitions}")
    if lower_bound >= upper_bound:
        raise ValueError(
            f"lower_bound must be < upper_bound, got [{lower_bound}, {upper_bound})"
        )
    if num_partitions == 1:
        return ["1=1"]
    span = upper_bound - lower_bound
    bounds = [
        lower_bound + (span * i) // num_partitions for i in range(1, num_partitions)
    ]
    c = partition_column
    preds = [f"{c} < {bounds[0]} OR {c} IS NULL"]
    for lo, hi in zip(bounds, bounds[1:]):
        preds.append(f"{c} >= {lo} AND {c} < {hi}")
    preds.append(f"{c} >= {bounds[-1]}")
    return preds


def jdbc_reader_options(
    url: str,
    table: str,
    user: str,
    password: str,
    fetchsize: int = 10_000,
    push_down_predicate: bool = True,
) -> dict[str, str]:
    """Option map for ``spark.read.format("jdbc")``: credentials are
    OPTIONS (never embedded in the URL, so logs showing the URL stay
    clean), ``fetchsize`` sizes the cursor batches (the driver default
    of 10 rows is the classic JDBC throughput killer), and predicate
    pushdown stays on so Catalyst filters become WHERE clauses on the
    remote engine."""
    return {
        "url": url,
        "dbtable": table,
        "user": user,
        "password": password,
        "fetchsize": str(fetchsize),
        "pushDownPredicate": "true" if push_down_predicate else "false",
    }


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    user: str,
    password: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetchsize: int = 10_000,
) -> DataFrame:
    """Parallel JDBC read: with partition bounds, N executor-side
    bounded queries via the explicit predicate plan
    (``jdbc_partition_predicates``); without, one connection (the
    correct shape only for small dimension tables). Driver-jar absence
    raises ``ConnectorUnavailable`` with the package hint for the
    URL's engine."""
    opts = jdbc_reader_options(url, table, user, password, fetchsize)
    reader = spark.read.format("jdbc").options(**opts)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower_bound and upper_bound")
        preds = jdbc_partition_predicates(
            partition_column, lower_bound, upper_bound, num_partitions
        )
        # one load per predicate union-ed would serialize planning;
        # Spark's predicate API does this in one relation:
        props = {"user": user, "password": password, "fetchsize": str(fetchsize)}
        try:
            return spark.read.jdbc(url, table, predicates=preds, properties=props)
        except Exception as e:
            _raise_jdbc_unavailable(url, e)
    try:
        return reader.load()
    except Exception as e:
        _raise_jdbc_unavailable(url, e)


def _raise_jdbc_unavailable(url: str, e: Exception):
    msg = str(e)
    if "No suitable driver" in msg or "ClassNotFoundException" in msg:
        engine = url.split(":")[1] if url.count(":") >= 2 else ""
        pkg = JDBC_DRIVERS.get(engine, "<your engine's JDBC driver>")
        raise ConnectorUnavailable(
            f"no JDBC driver for {redact_jdbc_url(url)!r}; launch with "
            f"--packages {pkg}"
        ) from e
    raise
