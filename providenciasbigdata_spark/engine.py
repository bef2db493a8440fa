"""The engine facade: one object exposing every capability a user of
the reference app (SebastianUs28/providenciasBigData) uses today, plus
the pipeline extensions — so switching is construct-and-call.

Reference page 1 ("Resultados de los Filtros", streamlit_app.py:109-148)
maps to ``facet_options`` + ``query_rulings``; page 2 ("Filtrar por
Similitudes", streamlit_app.py:150-177) maps to ``node_ids`` +
``similarity_neighborhood``. Connection config is constructor
parameters — never hardcoded credentials (the reference embeds live
URIs at streamlit_app.py:9,14; see SURVEY.md §0.1).

Everything stays a lazy DataFrame until the ``*_frame``/pandas helpers
at the presentation edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from providenciasbigdata_spark import multimodal, streaming
from providenciasbigdata_spark.compat import documents as _docs
from providenciasbigdata_spark.compat import graph as _graph
from providenciasbigdata_spark.io import load_table
from providenciasbigdata_spark.operators import dedup, similarity


class ProvidenciasEngine:
    """Facade over the document + graph query surfaces.

    Parameters
    ----------
    spark : the session (build with session.get_spark for tuned defaults)
    data_dir : directory holding the parquet tables (documents, embeddings)
    """

    def __init__(self, spark: SparkSession, data_dir: str):
        self.spark = spark
        self.data_dir = data_dir

    @classmethod
    def from_mongodump(
        cls, spark: SparkSession, dump_dir: str, data_dir: str = ""
    ) -> "ProvidenciasEngine":
        """Engine over an exported Mongo collection (mongoexport
        Extended-JSON, read through the custom Python DataSource in
        datasources.py) — the reference's production data path
        (streamlit_app.py:19-22) without a live server. Document
        queries run against the dump; graph queries still need the
        embeddings table, so pass ``data_dir`` if you use them."""
        eng = cls(spark, data_dir)
        eng._dump_dir = dump_dir
        return eng

    # -- sources (cached logical views, still lazy) -----------------------

    _dump_dir: str | None = None

    def rulings(self) -> DataFrame:
        if self._dump_dir is not None:
            # fresh .load() per call: the Python-DataSource runtime
            # caches the planned reader (incl. its pushed filters) per
            # loaded relation, so reusing one relation across
            # differently-filtered queries would leak the first
            # query's pushdown into the rest (pinned by
            # tests/test_modern.py)
            from pyspark.sql import functions as F

            from providenciasbigdata_spark import datasources

            datasources.register(self.spark)
            docs = (
                self.spark.read.format(datasources.FORMAT_NAME)
                .schema(
                    "_id string, providencia string, tipo string, anio int, texto string"
                )
                .load(self._dump_dir)
            )
            return docs.select(
                F.split(F.col("providencia"), "-")[1].cast("long").alias("doc_id"),
                "providencia",
                "tipo",
                "anio",
                "texto",
                _docs.tokenize(F.col("texto")).alias("tokens"),
            )
        return _docs.rulings_view(load_table(self.spark, self.data_dir, "documents"))

    def nodes(self) -> DataFrame:
        return _graph.nodes_view(load_table(self.spark, self.data_dir, "documents"))

    def edges(self, anchor_vec_id: int | None = None) -> DataFrame:
        emb = load_table(self.spark, self.data_dir, "embeddings")
        return _graph.build_similarity_edges(emb, anchor_vec_id=anchor_vec_id)

    # -- page 1: facets + text search ------------------------------------

    def facet_options(self, field: str) -> list:
        """Selectbox domains (reference streamlit_app.py:125-131)."""
        return [r[0] for r in _docs.distinct_values(self.rulings(), field).collect()]

    def query_rulings(
        self,
        providencia: str | None = None,
        tipo: str | None = None,
        anio: int | str | None = None,
        texto: str | None = None,
        conjunctive: bool = False,
        stem: bool = False,
    ) -> DataFrame:
        """The reference's filter dispatch (exclusive cascade by
        default; ``conjunctive=True`` for the AND extension;
        ``stem=True`` for Spanish-stemmed texto matching)."""
        return _docs.query_cascade(
            self.rulings(),
            providencia=providencia,
            tipo=tipo,
            anio=anio,
            texto=texto,
            conjunctive=conjunctive,
            stem=stem,
        )

    def query_rulings_frame(self, **kwargs):
        """Presentation edge: pandas frame with the reference's
        drop-storage-key + empty-sentinel behavior (A12)."""
        return _docs.to_result_frame(self.query_rulings(**kwargs))

    # -- literal reference IR (compat/ir.py) ------------------------------

    def query_mongo(self, query: dict, **cursor) -> DataFrame:
        """``collection.find(query)`` with the reference's own MQL
        filter documents (streamlit_app.py:31-32,137-148) — paste the
        dict, get the DataFrame. Keyword args pass through to the
        pymongo cursor surface (projection / sort / limit /
        default_language)."""
        from providenciasbigdata_spark.compat.ir import mql_find

        return mql_find(self.rulings(), query, **cursor)

    def aggregate_mongo(self, pipeline: list, **kwargs) -> DataFrame:
        """``collection.aggregate(pipeline)`` — the facet-counting
        surface one step beyond the reference's find() calls.
        ``collections=`` names the $lookup-able collection namespace."""
        from providenciasbigdata_spark.compat.ir import mql_aggregate

        return mql_aggregate(self.rulings(), pipeline, **kwargs)

    def find_one(self, query: dict, **cursor) -> dict | None:
        """``collection.findOne(query)`` — the first matching document
        as a plain dict, or None (pymongo's contract). Without a
        ``sort`` kwarg, "first" is UNSPECIFIED in Mongo too (B5); pass
        ``sort=`` for a deterministic pick. The limit is pushed into
        the plan (CollectLimit 1), never a full materialization."""
        row = self.query_mongo(query, **{**cursor, "limit": 1}).first()
        return row.asDict() if row is not None else None

    def count_documents(self, query: dict, **kwargs) -> int:
        """``collection.countDocuments(filter)`` — returns the scalar,
        like pymongo (the 1-row frame is an implementation detail)."""
        from providenciasbigdata_spark.compat.ir import mql_count_documents

        return mql_count_documents(self.rulings(), query, **kwargs).first()["n"]

    def distinct(self, field: str, query: dict | None = None, **kwargs) -> list:
        """``collection.distinct(field, filter)`` — sorted value list,
        like pymongo (the reference's A2 facet scans are the no-filter
        form; ``facet_options`` keeps the legacy name)."""
        from providenciasbigdata_spark.compat.ir import mql_distinct

        return [
            r[field] for r in mql_distinct(self.rulings(), field, query, **kwargs).collect()
        ]

    def run_cypher(self, query: str, params: dict | None = None) -> DataFrame:
        """Run the reference's Cypher templates verbatim
        (streamlit_app.py:50,60-64) against the derived graph."""
        from providenciasbigdata_spark.compat.ir import cypher_run

        return cypher_run(
            query,
            nodes=self.nodes(),
            edges=self.edges(),
            params=params,
        )

    # -- page 2: similarity graph ----------------------------------------

    def node_ids(self) -> list[str]:
        """Graph selectbox domain (reference streamlit_app.py:159-164)."""
        return [r.id for r in _graph.list_nodes(self.nodes()).collect()]

    def similarity_neighborhood(
        self, anchor: str, lo: float = 0.0, hi: float = 100.0
    ) -> DataFrame:
        """Anchored 1-hop expansion, weight in [lo, hi] inclusive
        (reference streamlit_app.py:60-64). Anchored edge build is
        O(n): only the anchor's outgoing cosines are computed."""
        vec_id = int(anchor.split("-", 1)[1])
        return _graph.neighborhood(self.edges(anchor_vec_id=vec_id), anchor, lo, hi)

    def neighborhood_graph(self, anchor: str, lo: float = 0.0, hi: float = 100.0):
        """(nodes_df, edges_df) for rendering — includes the singleton
        fallback (A14: the anchor renders even with zero edges)."""
        hits = self.similarity_neighborhood(anchor, lo, hi)
        return _graph.neighborhood_nodes(hits, anchor), hits

    # -- pipeline extensions ----------------------------------------------

    def deduplicate(self, method: str = "exact", **kwargs) -> DataFrame:
        docs = load_table(self.spark, self.data_dir, "documents")
        if method == "exact":
            return dedup.dedup_exact(docs, **kwargs)
        if method == "minhash":
            return dedup.minhash_near_dups(docs, **kwargs)
        if method == "simhash":
            return dedup.simhash_near_dups(dedup.simhash(docs), **kwargs)
        if method == "jaccard":
            return dedup.jaccard_pairs(docs, **kwargs)
        raise ValueError(f"unknown dedup method: {method!r}")

    def nearest_neighbors(self, query_vec, k: int = 10, approx: bool = False) -> DataFrame:
        emb = load_table(self.spark, self.data_dir, "embeddings")
        if approx:
            dim = len(emb.select("embedding").first().embedding)
            return similarity.srp_lsh_topk(emb, query_vec, dim=dim, k=k)
        return similarity.brute_force_topk(emb, query_vec, k=k)

    def events_stream(self, events_dir: str, **kwargs) -> DataFrame:
        return streaming.events_stream(self.spark, events_dir, **kwargs)

    def rulings_stream(self, dump_dir: str | None = None) -> DataFrame:
        """The collection as a STREAM: tail a mongoexport dump spool
        through the streaming Python DataSource (datasources.
        MongoDumpStreamReader — consumed-file offsets, deterministic
        replay). Pass ``dump_dir``, or construct the engine with
        ``from_mongodump`` and omit it. Returns a streaming DataFrame
        with the collection schema; compose any batch transform that
        streaming supports on top."""
        target = dump_dir or self._dump_dir
        if target is None:
            raise ValueError(
                "rulings_stream needs a dump_dir (or an engine built "
                "with from_mongodump)"
            )
        from providenciasbigdata_spark import datasources

        datasources.register(self.spark)
        return (
            self.spark.readStream.format(datasources.FORMAT_NAME)
            .schema(
                "_id string, providencia string, tipo string, anio int, texto string"
            )
            .load(target)
        )

    def media_features(self, assets: DataFrame, modality: str = "image") -> DataFrame:
        if modality == "image":
            return multimodal.decode_image_features(assets)
        if modality == "audio":
            return multimodal.decode_audio_features(assets)
        raise ValueError(f"unknown modality: {modality!r}")
