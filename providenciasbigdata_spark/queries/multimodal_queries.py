"""Multimodal-column queries (SURVEY.md C-X6) over an assets frame
derived deterministically from ``documents`` (payload = utf-8 bytes of
the text; the container has no media libs, so decode is the pinned fake
backend — the Spark plumbing is the real deliverable: binary columns,
Arrow batch shapes, mapInPandas row explosion, feature-then-shuffle).

Since round 11 nearly every row here is DuckDB-oracle-checked: the
payload is encode(text), so byte-level decodes (WAV PCM, BMP rasters,
perceptual hashes, frame fingerprints) and the md5-seeded fakes all
replay in SQL via hex-substring byte access; the residual rows-only
entries (PNG zlib scanlines, the environment-conditional PIL JPEG) name
their obstruction in WHY_NO_ORACLE.
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


def q_payload_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-class screen over every payload through the mapInArrow
    surface (multimodal.payload_entropy_arrow — Arrow batches pass to
    numpy zero-copy, no pandas materialization of binary cells). The
    hash-compared columns are the exactly-computable ones (byte count
    and two exact-count ratios — one IEEE division each); the entropy
    column itself is log2-based (the 1-ulp cross-engine ln/log trap)
    and is pinned against a pure-Python reference in
    tests/test_multimodal.py instead."""
    ent = multimodal.payload_entropy_arrow(
        assets_frame(spark, sf_dir), id_col="asset_id"
    )
    return ent.filter(F.col("n_bytes") > 0).select(
        "asset_id", "n_bytes", "ascii_ratio", "null_ratio"
    )


_PAYLOAD_ENTROPY_SQL = """
SELECT doc_id AS asset_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(length(text) - length(regexp_replace(text, '[ -~]', '', 'g')) AS DOUBLE)
           / CAST(octet_length(encode(text)) AS DOUBLE) AS ascii_ratio,
       0.0 AS null_ratio
FROM documents
WHERE octet_length(encode(text)) > 0
"""


def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake-backend image features. Oracle-checked since round 11: the
    deterministic fake decoder seeds from md5(payload) (was blake2b),
    and payload = encode(text), so DuckDB replays width/height/luma
    from md5(text) hex bytes exactly — the plumbing-under-test
    (binary column, Arrow batches, mapInPandas) now has a value hash,
    not just a schema check."""
    assets = assets_frame(spark, sf_dir).filter(F.col("modality") == "image")
    return multimodal.decode_image_features(assets)


def _md5b(i: int) -> str:
    return f"('0x' || substr(md5(text), 2*({i})+1, 2))::INT"


_IMAGE_FEATURES_SQL = f"""
SELECT doc_id AS asset_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(16 + {_md5b(0)} AS BIGINT) AS width,
       CAST(16 + {_md5b(1)} AS BIGINT) AS height,
       ROUND(({_md5b(2)} * 256 + {_md5b(3)}) / 65535.0, 6) AS mean_luma
FROM documents WHERE doc_id % 3 = 0
"""


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake-backend audio features. Oracle-checked since round 11: the
    fake decoder's RMS is over the RAW payload bytes (uint8), which
    the oracle re-derives from encode(text) via hex-substring byte
    access — an exact integer sum of squares, bit-identical doubles
    before the 6dp round."""
    assets = assets_frame(spark, sf_dir).filter(F.col("modality") == "audio")
    return multimodal.decode_audio_features(assets)


_AUDIO_FEATURES_SQL = """
WITH p AS (
  SELECT doc_id AS asset_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS L
  FROM documents WHERE doc_id % 3 = 1
),
s AS (
  SELECT asset_id, L,
         list_sum(list_transform(range(0, L), i ->
             CAST(POWER(('0x' || substr(hx, 2*i+1, 2))::INT, 2) AS BIGINT)
         )) AS sumsq
  FROM p
)
SELECT asset_id, CAST(L AS BIGINT) AS n_bytes,
       CAST(16000 AS BIGINT) AS sample_rate, CAST(L AS BIGINT) AS n_samples,
       CASE WHEN L = 0 THEN 0.0
            ELSE ROUND(sqrt(CAST(sumsq AS DOUBLE) / L), 6) END AS rms
FROM s
"""


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    assets = assets_frame(spark, sf_dir).filter(F.col("modality") == "video")
    frames = multimodal.sample_frames(assets, every_n=2, frame_bytes=256)
    return frames.groupBy("asset_id").agg(
        F.count("*").alias("n_frames_kept"),
        F.sum(F.octet_length("frame_bytes")).alias("bytes_kept"),
    )


# Frame sampling is pure arithmetic over the payload length: the fake
# container is fixed 256-byte chunks, every 2nd kept. n_frames =
# ceil(len/256); kept = indices 0,2,... => (n_frames+1)//2 frames; all
# kept frames are 256 bytes except a kept LAST frame (index n_frames-1,
# kept iff that index is even), which holds the remainder.
_FRAME_SAMPLE_SQL = """
WITH v AS (
  SELECT doc_id AS asset_id, octet_length(encode(text)) AS len
  FROM documents WHERE doc_id % 3 = 2 AND octet_length(encode(text)) > 0
), f AS (
  SELECT asset_id, len, (len + 255) // 256 AS n_frames FROM v
)
SELECT asset_id,
       CAST((n_frames + 1) // 2 AS BIGINT) AS n_frames_kept,
       CAST(CASE WHEN (n_frames - 1) % 2 = 0
                 THEN 256 * ((n_frames + 1) // 2 - 1) + (len - 256 * (n_frames - 1))
                 ELSE 256 * ((n_frames + 1) // 2)
            END AS BIGINT) AS bytes_kept
FROM f
"""


def _wav_containers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Valid RIFF/WAVE containers for every audio asset (stdlib
    ``wave``, one Arrow batch at a time) — the staged fixture both the
    real-decode path and the JVM header-introspection path read."""
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

    return assets.select("asset_id", "payload").mapInPandas(
        wrap, "asset_id long, payload binary"
    )


def _wav_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL container decode, end to end and fully distributed: the
    staged RIFF/WAVE containers recovered through the real ``"wav"``
    decode backend — no fake decoder anywhere in this path. The backend
    itself is pinned by tests/test_multimodal.py."""
    return multimodal.decode_audio_features(
        _wav_containers(spark, sf_dir), decode_backend="wav"
    )


def q_wav_header_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIFF/WAVE header metadata WITHOUT decode: audio format, channel
    count, sample rate, bits, data-chunk size — all ``le_uint`` JVM
    expressions over the binary column (the audio sibling of
    multimodal_bmp_header_jvm). Oracle: the container-write arithmetic
    (PCM 16-bit mono at 16 kHz; data bytes = odd-padded payload)."""
    wavs = _wav_containers(spark, sf_dir)
    return multimodal.wav_header_meta(wavs).filter(F.col("wav_ok")).select(
        "asset_id", "audio_format", "channels", "sample_rate",
        "bits_per_sample", "data_size",
    )


_WAV_HEADER_SQL = """
SELECT doc_id AS asset_id,
       CAST(1 AS BIGINT) AS audio_format,
       CAST(1 AS BIGINT) AS channels,
       CAST(16000 AS BIGINT) AS sample_rate,
       CAST(16 AS BIGINT) AS bits_per_sample,
       CAST(2 * ((octet_length(encode(text)) + 1) // 2) AS BIGINT) AS data_size
FROM documents WHERE doc_id % 3 = 1
"""


def q_wav_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked slice of the real WAV decode: the container
    header fields (sample rate pinned at write time, frame count =
    ceil(payload_len/2) after the odd-byte pad) are exact arithmetic a
    SQL oracle can reproduce — so the fully distributed decode path IS
    hash-checked. The PCM-derived RMS lives in the rows-only sibling
    ``multimodal_wav_rms`` (not SQL-expressible)."""
    feats = _wav_features(spark, sf_dir)
    return feats.select(
        "asset_id", "sample_rate", F.col("n_samples").alias("n_frames")
    )


_WAV_DECODE_SQL = """
SELECT doc_id AS asset_id,
       CAST(16000 AS BIGINT) AS sample_rate,
       CAST((octet_length(encode(text)) + 1) // 2 AS BIGINT) AS n_frames
FROM documents WHERE doc_id % 3 = 1
"""


def q_wav_rms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full real-decode feature set including RMS over the PCM.
    Oracle-checked since round 11: the container payload is
    encode(text), so the oracle re-derives every int16 sample from the
    UTF-8 bytes (hex-substring byte access) and computes RMS as an
    EXACT integer sum of squares — each numpy term s^2/2^30 is dyadic,
    so the kernel's mean is exact too and the doubles match
    bit-for-bit before the 6dp round. Backend also pinned on known
    byte patterns in tests/test_multimodal.py."""
    return _wav_features(spark, sf_dir)


# byte i (0-based) of the UTF-8 payload, 0 beyond the end (the
# even-length zero pad / raster zero fill both engines apply)
def _byte_sql(i: str) -> str:
    return f"CASE WHEN {i} < L THEN ('0x' || substr(hx, 2*({i})+1, 2))::INT ELSE 0 END"


_WAV_RMS_SQL = f"""
WITH p AS (
  SELECT doc_id AS asset_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS L
  FROM documents WHERE doc_id % 3 = 1
),
g AS (SELECT asset_id, hx, L, (L + 1) // 2 AS n FROM p),
s AS (
  SELECT asset_id, L, n,
    list_sum(list_transform(range(0, n), k ->
      CAST(POWER(({_byte_sql('2*k')}) + 256 * ({_byte_sql('2*k+1')})
           - CASE WHEN ({_byte_sql('2*k')}) + 256 * ({_byte_sql('2*k+1')}) >= 32768
                  THEN 65536 ELSE 0 END, 2) AS BIGINT))) AS sumsq
  FROM g
)
SELECT asset_id, CAST(44 + 2 * n AS BIGINT) AS n_bytes,
       CAST(16000 AS BIGINT) AS sample_rate, CAST(n AS BIGINT) AS n_samples,
       CASE WHEN n = 0 THEN 0.0
            ELSE ROUND(sqrt(CAST(sumsq AS DOUBLE) / n) / 32768.0, 6) END AS rms
FROM s
"""


def _bmp_containers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Valid 24-bpp BMP containers for every image asset (stdlib
    struct, one Arrow batch at a time) — the staged fixture both the
    real-decode path and the JVM header-introspection path read."""
    import pandas as pd

    assets = assets_frame(spark, sf_dir).filter(F.col("modality") == "image")

    def wrap(batches):
        for pdf in batches:
            out = [
                (aid, multimodal.encode_bmp(bytes(p) if p is not None else b""))
                for aid, p in zip(pdf["asset_id"], pdf["payload"])
            ]
            yield pd.DataFrame(out, columns=["asset_id", "payload"])

    return assets.select("asset_id", "payload").mapInPandas(
        wrap, "asset_id long, payload binary"
    )


def _bmp_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, end to end and fully distributed (the image
    sibling of the WAV path): the staged containers recovered through
    the real ``"bmp"`` decode backend — no fake decoder anywhere in
    this path. Backend pinned by tests/test_multimodal.py on known
    pixel bytes."""
    return multimodal.decode_image_features(
        _bmp_containers(spark, sf_dir), decode_backend="bmp"
    )


def q_bmp_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked slice of the real BMP decode: container geometry
    (width pinned at 16, height = ceil(len/48) rows min 1, container
    size = 54-byte headers + 48-byte rows) is exact arithmetic a SQL
    oracle reproduces — so the distributed decode path IS hash-checked.
    The pixel-derived mean luma lives in the rows-only sibling
    ``multimodal_bmp_luma``."""
    return _bmp_features(spark, sf_dir).select(
        "asset_id", "width", "height", "n_bytes"
    )


_BMP_DECODE_SQL = """
WITH v AS (
  SELECT doc_id AS asset_id,
         GREATEST(1, (octet_length(encode(text)) + 47) // 48) AS h
  FROM documents WHERE doc_id % 3 = 0
)
SELECT asset_id,
       CAST(16 AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       CAST(54 + 48 * h AS BIGINT) AS n_bytes
FROM v
"""


def q_bmp_luma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full real-decode feature set including mean luma over the BGR
    raster. Oracle-checked since round 11: the raster is encode(text)
    zero-filled to whole 16-px rows, so the oracle re-derives every
    BGR triple from the UTF-8 bytes and sums the ITU-R 601 integer
    numerator (299R + 587G + 114B) EXACTLY; the final /1000/(16h)/255
    association differs from numpy's elementwise path only at ~1e-13,
    far inside the 6dp round. Backend also pinned on known pixel bytes
    in tests/test_multimodal.py."""
    return _bmp_features(spark, sf_dir)


_BMP_LUMA_SQL = f"""
WITH p AS (
  SELECT doc_id AS asset_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS L
  FROM documents WHERE doc_id % 3 = 0
),
g AS (SELECT asset_id, hx, L, GREATEST(1, (L + 47) // 48) AS h FROM p),
s AS (
  SELECT asset_id, h,
    list_sum(list_transform(range(0, 16 * h), px ->
      299 * ({_byte_sql('3*px+2')})
      + 587 * ({_byte_sql('3*px+1')})
      + 114 * ({_byte_sql('3*px')})
    )) AS lsum
  FROM g
)
SELECT asset_id, CAST(54 + 48 * h AS BIGINT) AS n_bytes,
       CAST(16 AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
       ROUND(CAST(lsum AS DOUBLE) / 1000.0 / (16 * h) / 255.0, 6) AS mean_luma
FROM s
"""


def q_bmp_header_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Container metadata WITHOUT decode: width/height/bpp/file size
    read from the BMP header by PURE Catalyst expressions
    (multimodal.le_uint: substring -> hex -> byte-swap -> conv). The
    only Python stage in the plan is the fixture wrap that builds the
    containers (pinned in tests/test_plans.py); at 100 TB this is the
    scan-level pruning pass that runs BEFORE any Arrow decode batch.
    Oracle: the encode_bmp geometry arithmetic (width 16, height
    ceil(len/48) min 1, size = 54 + 48*height, bpp 24)."""
    bmps = _bmp_containers(spark, sf_dir)
    return multimodal.bmp_header_meta(bmps).filter(F.col("bmp_ok")).select(
        "asset_id", "width", "height", "bpp", "file_size", "data_offset"
    )


_BMP_HEADER_SQL = """
WITH v AS (
  SELECT doc_id AS asset_id,
         GREATEST(1, (octet_length(encode(text)) + 47) // 48) AS h
  FROM documents WHERE doc_id % 3 = 0
)
SELECT asset_id,
       CAST(16 AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       CAST(24 AS BIGINT) AS bpp,
       CAST(54 + 48 * h AS BIGINT) AS file_size,
       CAST(54 AS BIGINT) AS data_offset
FROM v
"""


def _png_containers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Valid 8-bit grayscale PNG containers for every video-modality
    asset (so the three real codecs cover all three modalities):
    stdlib zlib encode, one Arrow batch at a time."""
    import pandas as pd

    assets = assets_frame(spark, sf_dir).filter(F.col("modality") == "video")

    def wrap(batches):
        for pdf in batches:
            out = [
                (aid, multimodal.encode_png(bytes(p) if p is not None else b""))
                for aid, p in zip(pdf["asset_id"], pdf["payload"])
            ]
            yield pd.DataFrame(out, columns=["asset_id", "payload"])

    return assets.select("asset_id", "payload").mapInPandas(
        wrap, "asset_id long, payload binary"
    )


def q_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked slice of the real PNG decode (CRC-verified chunk
    walk, inflate, filter reconstruction): container geometry (width
    pinned at 16, height = ceil(len/16) rows min 1) is exact arithmetic
    a SQL oracle reproduces — so the distributed decode path IS
    hash-checked. Container size and pixel-derived luma live in the
    sibling ``multimodal_png_luma`` — itself oracle-backed since round
    13 (STORED-deflate IDAT makes both pure arithmetic)."""
    feats = multimodal.decode_image_features(
        _png_containers(spark, sf_dir), decode_backend="png"
    )
    return feats.select("asset_id", "width", "height")


_PNG_DECODE_SQL = """
SELECT doc_id AS asset_id,
       CAST(16 AS BIGINT) AS width,
       CAST(GREATEST(1, (octet_length(encode(text)) + 15) // 16) AS BIGINT) AS height
FROM documents WHERE doc_id % 3 = 2
"""


def q_png_luma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full real PNG decode feature set including mean luma over the
    reconstructed raster. Oracle-backed since round 13 (verdict-r12
    item 2): ``encode_png`` emits STORED (level-0) deflate blocks —
    still a valid zlib stream through the unchanged CRC-verified
    chunk-walk + inflate + unfilter decode path — so the container
    size is pure arithmetic (63 + 22·h bytes at width 16) and the
    grayscale raster is exactly the UTF-8 text bytes zero-padded to
    whole rows: the oracle re-derives the byte sum and replays
    round(S/(16h)/255, 6). Decode backend additionally pinned on known
    bytes and ALL five filter types in tests/test_multimodal.py."""
    return multimodal.decode_image_features(
        _png_containers(spark, sf_dir), decode_backend="png"
    )


_PNG_LUMA_SQL = f"""
WITH p AS (
  SELECT doc_id AS asset_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS L
  FROM documents WHERE doc_id % 3 = 2
),
g AS (SELECT asset_id, hx, L, GREATEST(1, (L + 15) // 16) AS h FROM p),
s AS (
  SELECT asset_id, h,
    list_sum(list_transform(range(0, 16 * h), px -> {_byte_sql('px')})) AS lsum
  FROM g
)
SELECT asset_id,
       CAST(63 + 22 * h AS BIGINT) AS n_bytes,
       CAST(16 AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       ROUND(CAST(lsum AS DOUBLE) / (16 * h) / 255.0, 6) AS mean_luma
FROM s
"""


def q_png_header_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG container metadata WITHOUT decode: width/height (big-endian
    IHDR fields via ``be_uint`` — no byte swap, hex IS the number),
    bit depth, color type; signature + IHDR-tag checked. The
    network-byte-order sibling of multimodal_bmp_header_jvm."""
    pngs = _png_containers(spark, sf_dir)
    return multimodal.png_header_meta(pngs).filter(F.col("png_ok")).select(
        "asset_id", "width", "height", "bit_depth", "color_type"
    )


_PNG_HEADER_SQL = """
SELECT doc_id AS asset_id,
       CAST(16 AS BIGINT) AS width,
       CAST(GREATEST(1, (octet_length(encode(text)) + 15) // 16) AS BIGINT) AS height,
       CAST(8 AS BIGINT) AS bit_depth,
       CAST(0 AS BIGINT) AS color_type
FROM documents WHERE doc_id % 3 = 2
"""


def q_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level exact dedup stats across the video corpus: every
    256-byte frame (no sampling), counted raw-BYTES-distinct — the
    multimodal->dedup handoff (duplicate frames across assets are the
    video analogue of duplicate paragraphs). Compares binary frames
    directly, no hash: COUNT(DISTINCT binary) is exact on both
    engines and sidesteps any UTF-8-boundary question."""
    assets = assets_frame(spark, sf_dir).filter(F.col("modality") == "video")
    frames = multimodal.sample_frames(assets, every_n=1, frame_bytes=256)
    return frames.agg(
        F.count("*").cast("long").alias("n_frames"),
        F.count_distinct("frame_bytes").cast("long").alias("n_distinct_frames"),
        F.count_distinct("asset_id").cast("long").alias("n_assets"),
    )


_FRAME_DEDUP_SQL = """
WITH v AS (
  -- DuckDB has no BLOB substring; slice in the HEX domain instead
  -- (2 chars/byte — distinct-hex is a bijection onto distinct-bytes)
  SELECT doc_id AS asset_id, hex(encode(text)) AS payload_hex,
         octet_length(encode(text)) AS len
  FROM documents WHERE doc_id % 3 = 2 AND octet_length(encode(text)) > 0
), frames AS (
  SELECT asset_id, substring(payload_hex, i * 512 + 1, 512) AS frame_hex
  FROM v, UNNEST(range((len + 255) // 256)) AS u(i)
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(COUNT(DISTINCT frame_hex) AS BIGINT) AS n_distinct_frames,
       CAST(COUNT(DISTINCT asset_id) AS BIGINT) AS n_assets
FROM frames
"""


def q_payload_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fake-embed every payload, then brute-force cosine top-10 against
    asset 0 — the multimodal->similarity handoff, end to end.
    Oracle-checked since round 11: the fake embedding is md5-derived
    int16 components (multimodal.embed_payload), so both engines run
    the cosine arithmetic on identical integer inputs — dot and
    norm-squared are exact, the final sqrt/divide are single correctly
    rounded IEEE ops, and the doubles match bit-for-bit before the
    6dp round."""
    emb = multimodal.embed_payload(assets_frame(spark, sf_dir), dim=16)
    qvec = emb.filter(F.col("asset_id") == 0).select("embedding").first().embedding
    return similarity.brute_force_topk(
        emb, [float(x) for x in qvec], k=10, id_col="asset_id"
    )


_EMBED_V16 = (
    "list_transform(range(0, 16), i -> "
    "CAST(('0x' || substr(CASE WHEN i < 8 THEN h1 ELSE h2 END, 2*((2*i) % 16)+1, 2))::INT * 256 "
    "+ ('0x' || substr(CASE WHEN i < 8 THEN h1 ELSE h2 END, 2*((2*i+1) % 16)+1, 2))::INT "
    "- 32768 AS DOUBLE))"
)

_EMBED_TOPK_SQL = f"""
WITH e AS (
  SELECT doc_id AS asset_id, md5(text) AS h1, md5(text || chr(1)) AS h2
  FROM documents
),
vecs AS (SELECT asset_id, {_EMBED_V16} AS v FROM e),
q AS (SELECT v AS qv FROM vecs WHERE asset_id = 0)
SELECT v.asset_id,
       ROUND(list_dot_product(v.v, q.qv)
             / (sqrt(list_dot_product(v.v, v.v))
                * sqrt(list_dot_product(q.qv, q.qv))), 6) AS score
FROM vecs v, q
ORDER BY score DESC, v.asset_id ASC LIMIT 10
"""


def _pgm_containers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Valid binary-PGM (netpbm P5) containers for every image asset —
    the third real raster fixture beside BMP and PNG."""
    import pandas as pd

    assets = assets_frame(spark, sf_dir).filter(F.col("modality") == "image")

    def wrap(batches):
        for pdf in batches:
            out = [
                (aid, multimodal.encode_pgm(bytes(p) if p is not None else b""))
                for aid, p in zip(pdf["asset_id"], pdf["payload"])
            ]
            yield pd.DataFrame(out, columns=["asset_id", "payload"])

    return assets.select("asset_id", "payload").mapInPandas(
        wrap, "asset_id long, payload binary"
    )


def q_pgm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checked slice of the real netpbm decode (round 6): the
    ``"pnm"`` backend parses the ASCII header (whitespace + comment
    grammar) and recovers geometry — width pinned at 16, height =
    ceil(len/16) min 1, container size = 11 + digits(h) + 16·h (the
    encode_pgm arithmetic) — all SQL-reproducible, so the distributed
    header-parse + decode path is hash-checked. P5 luma == raw byte
    mean, pinned with P6 RGB on known bytes in tests."""
    feats = multimodal.decode_image_features(
        _pgm_containers(spark, sf_dir), decode_backend="pnm"
    )
    return feats.select("asset_id", "width", "height", "n_bytes")


_PGM_DECODE_SQL = """
WITH v AS (
  SELECT doc_id AS asset_id,
         GREATEST(1, (octet_length(encode(text)) + 15) // 16) AS h
  FROM documents WHERE doc_id % 3 = 0
)
SELECT asset_id,
       CAST(16 AS BIGINT) AS width,
       CAST(h AS BIGINT) AS height,
       CAST(11 + length(CAST(h AS VARCHAR)) + 16 * h AS BIGINT) AS n_bytes
FROM v
"""


def q_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual IMAGE dedup (round 7): aHash fingerprints over the
    real-decoded BMP containers, then the SAME Hamming pigeonhole join
    text SimHash uses — near-duplicate images surface as fingerprint
    pairs within distance 4. The 'resize' is an exact index-boundary
    8x8 average pool (stdlib+numpy; no interpolation choices to
    diverge on). Oracle-checked since round 11: the raster is
    encode(text) zero-filled into 16-px rows, luma is the exact
    1000x-scaled ITU-R 601 integer, pool cells are integer-sum /
    block-size rationals, and the only float comparison (cell > mean
    of 64 cells) sits far from any 1-ulp tie on the fixtures — so the
    whole fingerprint + pigeonhole Hamming join replays in SQL.
    Identical/near/unrelated semantics and the python-twin agreement
    stay pinned in tests/test_multimodal.py."""
    from providenciasbigdata_spark.operators.dedup import simhash_near_dups

    fps = multimodal.perceptual_hash(
        _bmp_containers(spark, sf_dir), id_col="asset_id", kind="ahash"
    )
    return simhash_near_dups(fps, max_hamming=4)


# byte i (0-based) of the image payload, 0 beyond the end
def _pb(i: str) -> str:
    return f"CASE WHEN {i} < L THEN ('0x' || substr(hx, 2*({i})+1, 2))::INT ELSE 0 END"


def _pluma(x: str) -> str:
    """1000x-scaled integer luma of pixel (y, x) of the 16-wide raster."""
    return (f"(299 * ({_pb(f'48*y + 3*({x}) + 2')})"
            f" + 587 * ({_pb(f'48*y + 3*({x}) + 1')})"
            f" + 114 * ({_pb(f'48*y + 3*({x})')}))")


_PH_Y0 = "((c // 8) * h // 8)"
_PH_Y1 = f"GREATEST((c // 8 + 1) * h // 8, {_PH_Y0} + 1)"

_PHASH_DEDUP_SQL = f"""
WITH p AS (
  SELECT doc_id AS id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS L,
         GREATEST(1, (octet_length(encode(text)) + 47) // 48) AS h
  FROM documents WHERE doc_id % 3 = 0
),
cellmeans AS (
  -- the 8x8 index-boundary average pool: x-blocks are exactly 2 px
  -- (width 16), y-blocks are integer row ranges with the same
  -- max(y1, y0+1) degeneracy rule as _pool_mean
  SELECT id,
    list_transform(range(0, 64), c ->
      CAST(list_sum(list_transform(range({_PH_Y0}, {_PH_Y1}),
             y -> {_pluma('2 * (c % 8)')} + {_pluma('2 * (c % 8) + 1')})) AS DOUBLE)
      / (2 * ({_PH_Y1} - {_PH_Y0}))
    ) AS cm
  FROM p
),
fpu AS (
  SELECT id,
         SUM(CASE WHEN cm[k + 1] > list_sum(cm) / 64.0
                  THEN (1::UBIGINT << (63 - k))::HUGEINT ELSE 0 END) AS u
  FROM cellmeans, UNNEST(range(0, 64)) AS t(k)
  GROUP BY id
),
fps AS (
  SELECT id,
         CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
                   THEN u - 18446744073709551616::HUGEINT ELSE u END AS BIGINT)
             AS simhash
  FROM fpu
)
SELECT a.id AS left_id, b.id AS right_id,
       CAST(bit_count(xor(a.simhash::BIT, b.simhash::BIT)) AS BIGINT) AS hamming
FROM fps a JOIN fps b ON a.id < b.id
WHERE bit_count(xor(a.simhash::BIT, b.simhash::BIT)) <= 4
"""


def q_shot_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over the sampled video frames (round
    7): per-frame perceptual aHash through the REAL BMP decode, one
    lag window per asset, boundary = Hamming jump above threshold —
    classic video segmentation from pieces already in CI.
    Oracle-checked since round 11: frames are 512-byte payload chunks,
    each wrapped into an 8-px-wide raster — the same integer-luma /
    rational-pool replay as multimodal_phash_dedup, per (asset, frame),
    then a SQL lag window reproduces the jump detector exactly. The
    planted two-scene cut stays pinned in tests/test_multimodal.py."""
    assets = assets_frame(spark, sf_dir).filter(F.col("modality") == "video")
    frames = multimodal.sample_frames(assets, every_n=1, frame_bytes=512)
    b = multimodal.shot_boundaries(frames, max_hamming=12, frame_width=8)
    return b.groupBy("asset_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_frames"),
        F.sum(F.col("is_boundary").cast("long")).cast("long").alias("n_shots"),
        F.max("hamming").cast("long").alias("max_jump"),
    )


# byte i of frame f (512-byte chunks), zero beyond the frame end
def _fb(i: str) -> str:
    return (f"CASE WHEN ({i}) < LEAST(L - 512*f, 512) "
            f"THEN ('0x' || substr(hx, 2*(512*f + ({i}))+1, 2))::INT ELSE 0 END")


def _fluma(x: str) -> str:
    """Integer luma of pixel (y, x) of a frame's 8-wide raster."""
    return (f"(299 * ({_fb(f'24*y + 3*({x}) + 2')})"
            f" + 587 * ({_fb(f'24*y + 3*({x}) + 1')})"
            f" + 114 * ({_fb(f'24*y + 3*({x})')}))")


_SHOT_BOUNDARIES_SQL = f"""
WITH p AS (
  SELECT doc_id AS asset_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS L
  FROM documents WHERE doc_id % 3 = 2 AND octet_length(encode(text)) > 0
),
fr AS (
  SELECT asset_id, hx, L, t.f AS f,
         GREATEST(1, (LEAST(L - 512*t.f, 512) + 23) // 24) AS h
  FROM p, UNNEST(range(0, (L + 511) // 512)) AS t(f)
),
cellmeans AS (
  SELECT asset_id, f,
    list_transform(range(0, 64), c ->
      CAST(list_sum(list_transform(range({_PH_Y0}, {_PH_Y1}),
             y -> {_fluma('c % 8')})) AS DOUBLE)
      / ({_PH_Y1} - {_PH_Y0})
    ) AS cm
  FROM fr
),
fpu AS (
  SELECT asset_id, f,
         SUM(CASE WHEN cm[k + 1] > list_sum(cm) / 64.0
                  THEN (1::UBIGINT << (63 - k))::HUGEINT ELSE 0 END) AS u
  FROM cellmeans, UNNEST(range(0, 64)) AS t(k)
  GROUP BY asset_id, f
),
fps AS (
  SELECT asset_id, f,
         CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
                   THEN u - 18446744073709551616::HUGEINT ELSE u END AS BIGINT) AS fp
  FROM fpu
),
lagd AS (
  SELECT asset_id, fp,
         lag(fp) OVER (PARTITION BY asset_id ORDER BY f) AS prev
  FROM fps
),
feat AS (
  SELECT asset_id,
         CASE WHEN prev IS NULL THEN NULL
              ELSE bit_count(xor(fp::BIT, prev::BIT)) END AS hamming,
         (prev IS NULL OR bit_count(xor(fp::BIT, prev::BIT)) > 12) AS is_boundary
  FROM lagd
)
SELECT asset_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(CASE WHEN is_boundary THEN 1 ELSE 0 END) AS BIGINT) AS n_shots,
       CAST(MAX(hamming) AS BIGINT) AS max_jump
FROM feat GROUP BY asset_id
"""


def q_jpeg_header_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JPEG geometry at SCAN TIME (round 8, verdict-r7 item 7): the
    SOF frame header hides behind a variable-length marker-segment
    chain, so this is the bounded JVM segment WALK
    (multimodal.jpeg_header_meta — one F.aggregate whose accumulator
    struct carries the walk state), not a fixed-offset read. The
    FIXTURE is also pure JVM: header bytes are concat'd binary
    literals around unhex'd big-endian geometry fields derived from
    doc_id, so the whole plan — synthesis AND introspection — is one
    codegen'd projection with zero Python. Oracle: the synthesis
    arithmetic (encode->walk must be the identity)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    w = (F.lit(16) + F.col("doc_id") % 1009).cast("long")
    h = (F.lit(16) + (F.col("doc_id") * 7) % 997).cast("long")
    prog = F.col("doc_id") % 2 == 1

    def be2(c):
        return F.unhex(F.lpad(F.hex(c), 4, "0"))

    payload = F.concat(
        F.lit(b"\xff\xd8"
              b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
              b"\xff\xdb\x00\x04\x00\x11"),
        F.when(prog, F.lit(b"\xff\xc2")).otherwise(F.lit(b"\xff\xc0")),
        F.lit(b"\x00\x11\x08"),
        be2(h),
        be2(w),
        F.lit(b"\x03"
              b"\x01\x11\x00\x02\x11\x00\x03\x11\x00"
              b"\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00"),
    )
    jpegs = docs.select(F.col("doc_id").alias("asset_id"), payload.alias("payload"))
    return multimodal.jpeg_header_meta(jpegs).filter(F.col("jpeg_ok")).select(
        "asset_id", "width", "height", "components", "sof_marker", "progressive"
    )


_JPEG_HEADER_SQL = """
SELECT doc_id AS asset_id,
       CAST(16 + doc_id % 1009 AS BIGINT) AS width,
       CAST(16 + (doc_id * 7) % 997 AS BIGINT) AS height,
       CAST(3 AS BIGINT) AS components,
       CAST(CASE WHEN doc_id % 2 = 1 THEN 65474 ELSE 65472 END AS BIGINT)
         AS sof_marker,
       (doc_id % 2 = 1) AS progressive
FROM documents
"""


def q_jpeg_decode_crosscheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-less JPEG decode proof (round 9, verdict-r8 item 7):
    where Pillow exists, real PIL-encoded JPEGs are decoded and the
    geometry cross-checked against the independent JVM header walk;
    where it is absent (this container), the same plan runs the walk
    over stdlib header fixtures with backend='header_only'. Stable
    schema both ways (multimodal.jpeg_decode_crosscheck)."""
    return multimodal.jpeg_decode_crosscheck(spark)


QUERIES = {
    "multimodal_jpeg_decode_pil": (q_jpeg_decode_crosscheck, None),
    "multimodal_phash_dedup": (q_phash_dedup, _PHASH_DEDUP_SQL),
    "multimodal_jpeg_header_jvm": (q_jpeg_header_jvm, _JPEG_HEADER_SQL),
    "multimodal_shot_boundaries": (q_shot_boundaries, _SHOT_BOUNDARIES_SQL),
    "multimodal_payload_stats": (q_payload_stats, _PAYLOAD_STATS_SQL),
    "multimodal_pgm_decode": (q_pgm_decode, _PGM_DECODE_SQL),
    "multimodal_payload_entropy": (q_payload_entropy, _PAYLOAD_ENTROPY_SQL),
    "multimodal_image_features": (q_image_features, _IMAGE_FEATURES_SQL),
    "multimodal_audio_features": (q_audio_features, _AUDIO_FEATURES_SQL),
    "multimodal_frame_sample": (q_frame_sample, _FRAME_SAMPLE_SQL),
    "multimodal_wav_decode": (q_wav_decode_features, _WAV_DECODE_SQL),
    "multimodal_wav_rms": (q_wav_rms, _WAV_RMS_SQL),
    "multimodal_bmp_decode": (q_bmp_decode, _BMP_DECODE_SQL),
    "multimodal_bmp_header_jvm": (q_bmp_header_jvm, _BMP_HEADER_SQL),
    "multimodal_bmp_luma": (q_bmp_luma, _BMP_LUMA_SQL),
    "multimodal_png_decode": (q_png_decode, _PNG_DECODE_SQL),
    "multimodal_png_header_jvm": (q_png_header_jvm, _PNG_HEADER_SQL),
    "multimodal_png_luma": (q_png_luma, _PNG_LUMA_SQL),
    "multimodal_wav_header_jvm": (q_wav_header_jvm, _WAV_HEADER_SQL),
    "multimodal_frame_dedup": (q_frame_dedup, _FRAME_DEDUP_SQL),
    "multimodal_embed_topk": (q_payload_embed_topk, _EMBED_TOPK_SQL),
}

WHY_NO_ORACLE = {
    "multimodal_jpeg_decode_pil": (
        "environment-conditional backend: with Pillow installed the rows "
        "carry a real JPEG encode->decode->header-walk geometry cross-check "
        "(geom_match must be all-true, pinned in tests/test_multimodal.py); "
        "without it (this container) the degraded header_only branch and "
        "the NotImplementedError of the raw pil backend are both pinned — "
        "not expressible as a fixed SQL oracle across environments"
    ),
}
