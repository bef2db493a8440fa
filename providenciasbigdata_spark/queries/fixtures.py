"""Session-staged similarity-edges fixture (verdict-r6 item 2).

Every generic-edges graph/Cypher registry query needs the SAME
scaffold: ``edges(src, dst, similitud)`` = bounded all-pairs cosine
over the embeddings fixture. Building it inline made graded queries
time the O(n^2) scaffold instead of the operator under test
(``cypher_count_distinct`` spent most of its 3.2 s bench wall in the
edge build; the unbounded build measured 41 s). Stage the build ONCE
per (fixture vintage, bound) as parquet under /tmp — keyed by a
size+mtime fingerprint of the source parquet so a driver-regenerated
fixture can never be served stale (the same rule as the io/modern
ORC/CSV/mongodump staging) — and let every query read the staged
table: similitud bands and anchors then push into a parquet scan
instead of recomputing cosines per query.

At 100 TB the analogue is exactly this: materialize the similarity
graph once (``operators.similarity.lsh_similarity_join`` -> table),
query it many times; nobody recomputes an n^2 cosine join per query.
One query (``cypher_two_hop_motif``) deliberately keeps the inline
end-to-end build so that path stays covered.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from providenciasbigdata_spark.compat.graph import build_similarity_edges
from providenciasbigdata_spark import staging
from providenciasbigdata_spark.io import load_table
from providenciasbigdata_spark.queries.modern import _sf_tag, _source_fingerprint


def staged_similarity_edges(
    spark: SparkSession, sf_dir: str, bound: int
) -> DataFrame:
    """Read (building once per session/vintage) the bounded similarity
    edge table: ``build_similarity_edges(embeddings WHERE vec_id <
    bound)`` materialized as parquet. Values are bit-identical to the
    inline build (parquet round-trips doubles exactly), so oracle SQL
    that derives the same edges inline keeps hash-matching."""
    out = os.path.join(
        tempfile.gettempdir(),
        f"pbd_simedges_{_sf_tag(sf_dir)}_b{bound}_"
        f"{_source_fingerprint(sf_dir, 'embeddings')}",
    )
    done = os.path.join(out, "_SUCCESS")
    if not os.path.exists(done):
        with staging.stage(out):
            # a dir without _SUCCESS is a crashed build: clear it
            if os.path.exists(out):
                shutil.rmtree(out, ignore_errors=True)
            emb = (
                load_table(spark, sf_dir, "embeddings")
                .filter(F.col("vec_id") < int(bound))
                .repartition(16)  # the bounded slice is one input split
            )
            tmp = f"{out}.tmp-{os.getpid()}"
            build_similarity_edges(emb).write.mode("overwrite").parquet(tmp)
            try:
                os.rename(tmp, out)
            except OSError:
                # lost a concurrent race — reuse the winner's copy
                shutil.rmtree(tmp, ignore_errors=True)
                if not os.path.exists(done):
                    raise
    return spark.read.parquet(out)
