"""Multimodal-column queries (SURVEY.md C-X6) over an assets frame
derived deterministically from ``documents`` (payload = utf-8 bytes of
the text; the container has no media libs, so decode is the pinned fake
backend — the Spark plumbing is the real deliverable: binary columns,
Arrow batch shapes, mapInPandas row explosion, feature-then-shuffle).

``multimodal_payload_stats`` is fully oracle-checked (byte length + md5
are computable in DuckDB over the same encoded payload); the fake-decode
features are rows-only and property-tested in tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from providenciasbigdata_spark import multimodal
from providenciasbigdata_spark.io import load_table
from providenciasbigdata_spark.operators import similarity

MODALITIES = ["image", "audio", "video"]


def assets_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic assets table: payload = encode(text), modality
    cycles by doc_id, typed metadata map. Binary stays opaque — every
    downstream op derives features map-only before any shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        modality.alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


def q_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = multimodal.attach_payload_stats(assets_frame(spark, sf_dir))
    return (
        assets.groupBy("modality")
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("n_bytes").alias("total_bytes"),
            F.count_distinct("payload_md5").alias("n_distinct_payloads"),
        )
    )


_PAYLOAD_STATS_SQL = """
SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
           AS modality,
       COUNT(*) AS n_assets,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       COUNT(DISTINCT md5(text)) AS n_distinct_payloads
FROM documents
GROUP BY 1
"""


def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = assets_frame(spark, sf_dir).filter(F.col("modality") == "image")
    return multimodal.decode_image_features(assets)


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = assets_frame(spark, sf_dir).filter(F.col("modality") == "audio")
    return multimodal.decode_audio_features(assets)


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = assets_frame(spark, sf_dir).filter(F.col("modality") == "video")
    frames = multimodal.sample_frames(assets, every_n=2, frame_bytes=256)
    return frames.groupBy("asset_id").agg(
        F.count("*").alias("n_frames_kept"),
        F.sum(F.octet_length("frame_bytes")).alias("bytes_kept"),
    )


def q_wav_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL container decode, end to end and fully distributed: wrap
    each audio asset's bytes into a valid RIFF/WAVE container (stdlib
    ``wave``, one Arrow batch at a time), then recover sample rate /
    frame count / RMS through the real ``"wav"`` decode backend — no
    fake decoder anywhere in this path. Rows-only (RMS over PCM isn't
    SQL-expressible in the oracle); the backend itself is pinned by
    tests/test_multimodal.py::test_wav_backend_real_decode."""
    import pandas as pd

    assets = assets_frame(spark, sf_dir).filter(F.col("modality") == "audio")

    def wrap(batches):
        import io
        import wave

        for pdf in batches:
            out = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                if len(b) % 2:  # whole 16-bit frames only
                    b += b"\x00"
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(16000)
                    w.writeframes(b)
                out.append((aid, buf.getvalue()))
            yield pd.DataFrame(out, columns=["asset_id", "payload"])

    wavs = assets.select("asset_id", "payload").mapInPandas(
        wrap, "asset_id long, payload binary"
    )
    return multimodal.decode_audio_features(wavs, decode_backend="wav")


def q_payload_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake-embed every payload, then brute-force cosine top-10 against
    asset 0 — the multimodal->similarity handoff, end to end."""
    emb = multimodal.embed_payload(assets_frame(spark, sf_dir), dim=16)
    qvec = emb.filter(F.col("asset_id") == 0).select("embedding").first().embedding
    return similarity.brute_force_topk(
        emb, [float(x) for x in qvec], k=10, id_col="asset_id"
    )


QUERIES = {
    "multimodal_payload_stats": (q_payload_stats, _PAYLOAD_STATS_SQL),
    "multimodal_image_features": (q_image_features, None),
    "multimodal_audio_features": (q_audio_features, None),
    "multimodal_frame_sample": (q_frame_sample, None),
    "multimodal_wav_decode": (q_wav_decode_features, None),
    "multimodal_embed_topk": (q_payload_embed_topk, None),
}
