"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed in Arrow batches via mapInPandas.

The container has no image/audio codecs, so the decode step is a
clearly-marked deterministic fake (`_fake_decode`) — but the Spark-side
plumbing is real and is what matters at scale: binary columns stay
opaque bytes end-to-end, per-batch Python processing over Arrow (no
per-row serde), explicit output schema, and partition-count preserved
(no shuffle introduced by the UDF).

A real deployment would swap `_fake_decode` for PIL/ffmpeg calls with
the identical signature.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_SCHEMA = (
    "doc_id bigint, byte_len int, sha256 string, width int, height int, decoded boolean"
)


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """STUB: stands in for an image decode (no codec libs in this
    container). Returns deterministic fake (width, height) derived from
    the payload hash. Replace with e.g. PIL.Image.open for real data."""
    h = hashlib.sha256(payload).digest()
    return 1 + h[0] % 64, 1 + h[1] % 64


def attach_binary(df: DataFrame) -> DataFrame:
    """Model an opaque media payload: encode text as the binary column
    (the testdata ships no true media blobs)."""
    return df.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )


def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batch in → decode metadata out.

    Only the decode itself runs here; byte_len/sha256 arrive
    precomputed from JVM built-ins (F.length / F.sha2) and pass
    through untouched — Python never re-hashes the payload bytes."""
    for pdf in it:
        dims = [_fake_decode(bytes(p)) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": pdf["byte_len"],
                "sha256": pdf["sha256"],
                "width": [d[0] for d in dims],
                "height": [d[1] for d in dims],
                "decoded": True,
            }
        )


def multimodal_extract(df: DataFrame) -> DataFrame:
    """binary payload → (byte_len, sha256, fake-decoded dims).

    Cheap metadata (length, sha256) is computed JVM-side in whole-stage
    codegen; the payload crosses to Python exactly once, for the decode
    step that genuinely needs the bytes."""
    with_meta = attach_binary(df).select(
        "doc_id",
        "payload",
        F.length("payload").alias("byte_len"),
        F.lower(F.sha2("payload", 256)).alias("sha256"),
    )
    return with_meta.mapInPandas(decode_batches, OUT_SCHEMA)


def multimodal_extract_sql() -> str:
    """Oracle for the engine-checkable part (byte length + sha256; the
    fake dims are reproduced from the same sha bytes)."""
    return """
        SELECT doc_id,
               octet_length(encode(text)) AS byte_len,
               sha256(text) AS sha256,
               1 + (('0x' || substring(sha256(text), 1, 2))::INT % 64) AS width,
               1 + (('0x' || substring(sha256(text), 3, 2))::INT % 64) AS height,
               TRUE AS decoded
        FROM documents
    """


# ---------------------------------------------------------------------------
# Frame sampling: the 1-row-in → N-rows-out batch shape (video → frames)
# ---------------------------------------------------------------------------

FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_sha string"
MAX_FRAMES = 4


def _fake_frame(sha_hex: str, idx: int) -> str:
    """STUB: stands in for decoding frame ``idx`` out of a video payload
    (no codecs here). Deterministic per (payload, idx); a real pipeline
    returns the frame's bytes/features from ffmpeg with this exact
    per-frame fan-out shape."""
    return hashlib.sha256(f"{sha_hex}|{idx}".encode()).hexdigest()


def frame_sample_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker with ROW FAN-OUT: each input payload yields
    1 + (byte_len % MAX_FRAMES) frame rows — the video-sampling batch
    shape, where output cardinality is data-dependent and decided
    inside the Arrow batch. No shuffle is introduced; the explode
    happens per partition."""
    for pdf in it:
        doc_ids, idxs, shas = [], [], []
        for doc_id, byte_len, sha in zip(
            pdf["doc_id"], pdf["byte_len"], pdf["sha256"]
        ):
            for i in range(1 + int(byte_len) % MAX_FRAMES):
                doc_ids.append(doc_id)
                idxs.append(i)
                shas.append(_fake_frame(sha, i))
        yield pd.DataFrame(
            {"doc_id": doc_ids, "frame_idx": idxs, "frame_sha": shas}
        )


def multimodal_frame_sample(df: DataFrame) -> DataFrame:
    """payload → sampled frame rows (1 + byte_len % MAX_FRAMES per doc).

    Metadata the fan-out depends on (byte length, payload sha) computes
    JVM-side; Python sees one Arrow batch per partition and expands it
    row-locally — at 100 TB the shape stays embarrassingly parallel,
    with output partitioning inherited from the input scan."""
    with_meta = attach_binary(df).select(
        "doc_id",
        F.length("payload").alias("byte_len"),
        F.lower(F.sha2("payload", 256)).alias("sha256"),
    )
    return with_meta.mapInPandas(frame_sample_batches, FRAME_SCHEMA)


def multimodal_frame_sample_sql() -> str:
    return f"""
        SELECT doc_id, CAST(i AS INT) AS frame_idx,
               sha256(sha256(text) || '|' || CAST(i AS VARCHAR)) AS frame_sha
        FROM documents,
             LATERAL unnest(generate_series(
               0, octet_length(encode(text)) % {MAX_FRAMES})) AS t(i)
    """
