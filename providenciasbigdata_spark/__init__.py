"""providenciasbigdata_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the query and data-processing
capabilities of the reference repo ``SebastianUs28/providenciasBigData``
(a Streamlit client over MongoDB Atlas + Neo4j Aura; see SURVEY.md).

The reference delegates all query execution to two managed database
servers; this engine subsumes both roles with DataFrame/Catalyst plans:

- document facet + full-text queries  -> ``compat.documents``
- similarity-graph neighborhood       -> ``compat.graph``
- relational surface (joins/aggs/...) -> ``queries.relational``
- LLM-data-pipeline operators         -> ``operators.{dedup,similarity}``,
                                         ``functions.text``
- streaming                           -> ``streaming.windows``

Everything is lazy DataFrames end-to-end; ``.toPandas()``/``.collect()``
only at the presentation edge (contrast the reference's eager
``list(cursor)`` at streamlit_app.py:32,71).
"""

__version__ = "0.1.0"
