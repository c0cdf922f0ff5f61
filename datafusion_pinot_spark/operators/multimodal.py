"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: keep the payload as an opaque
``binary`` column with a typed metadata struct alongside; decode / feature-
extract in Arrow-batched ``mapInPandas`` so bytes never round-trip through
Python row-by-row and partitions stream batch-at-a-time (bounded memory).

The actual media decode is STUBBED (no PIL/ffmpeg in this container): the
default ``fake_decode`` derives deterministic pseudo-features from the bytes
so the Spark-side plumbing — schema, batching, partition flow — is real and
testable; swap in a real decoder via the ``decode_fn`` argument. Passing
``decode_fn=real_decode`` raises NotImplementedError, marking exactly where
a real pipeline plugs in."""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, n_frames int, checksum long"
)


def real_decode(payload: bytes) -> dict:
    """Placeholder for a real image/audio decoder (PIL/ffmpeg not shipped)."""
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in this "
        "environment; use fake_decode for plumbing tests"
    )


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in features derived purely from the bytes."""
    n = len(payload)
    return {
        "n_bytes": n,
        "width": n % 640 + 1,
        "height": n % 480 + 1,
        "n_frames": n % 30 + 1,
        "checksum": sum(payload) % (1 << 31),
    }


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary column + metadata struct (simulated media)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("fake/media").alias("mime"),
            F.length(F.encode("text", "utf-8")).alias("n_bytes"),
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame, decode_fn: Callable[[bytes], dict] = fake_decode
) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(decode_fn)
            out = pd.DataFrame(list(feats))
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, width int, height int, n_bytes_resized int"
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_len int, frame_checksum long"


def resize_media(
    media: DataFrame,
    width: int = 64,
    height: int = 64,
    resample_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize plumbing: payload → fixed-target payload in ``mapInPandas``.

    The real pixel resample is the stub seam (``resample_fn``; defaults to a
    deterministic truncate-to-target byte fake). Plumbing — schema, Arrow
    batching, per-batch streaming — is real: on a cluster each partition
    streams through Python in bounded batches, payloads never concatenate."""

    def fake_resample(payload: bytes, w: int, h: int) -> bytes:
        return payload[: w * h // 64]

    fn = resample_fn or fake_resample

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(lambda p: fn(p, width, height))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": width,
                    "height": height,
                    "n_bytes_resized": resized.map(len).astype("int32"),
                }
            )

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)


def resize_media_oracle_sql(width: int = 64, height: int = 64) -> str:
    target = width * height // 64
    return f"""
SELECT doc_id, {width} AS width, {height} AS height,
       CAST(least(octet_length(encode(text)), {target}) AS INT) AS n_bytes_resized
FROM documents
"""


def sample_frames(media: DataFrame, every_k: int = 3) -> DataFrame:
    """Frame sampling plumbing: one output row per sampled frame.

    The deterministic fake frame model splits the payload into
    ``n_frames = n_bytes % 30 + 1`` contiguous chunks (consistent with
    ``fake_decode``) and emits every ``every_k``-th chunk's length and byte
    checksum; a real video pipeline swaps the chunker for an ffmpeg seek.
    Shape note: output is a row explosion inside ``mapInPandas`` — no
    driver involvement, no shuffle; downstream ops see a normal DataFrame."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_len": [], "frame_checksum": []}
            for doc_id, payload in zip(pdf["doc_id"].values, pdf["payload"]):
                n = len(payload)
                nf = n % 30 + 1
                for i in range(0, nf, every_k):
                    lo, hi = i * n // nf, (i + 1) * n // nf
                    chunk = payload[lo:hi]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_len"].append(hi - lo)
                    out["frame_checksum"].append(sum(chunk) % (1 << 31))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def sample_frames_oracle_sql(every_k: int = 3) -> str:
    # ASCII text ⇒ codepoint sum == byte sum (asserted in tests).
    return f"""
WITH b AS (
  SELECT doc_id, text, octet_length(encode(text)) AS n,
         octet_length(encode(text)) % 30 + 1 AS nf
  FROM documents
), frames AS (
  SELECT doc_id, text, n, nf, unnest(generate_series(0, nf - 1)) AS i FROM b
)
SELECT doc_id, CAST(i AS INT) AS frame_idx,
       CAST((i + 1) * n // nf - i * n // nf AS INT) AS frame_len,
       CAST(coalesce(list_sum(list_transform(
                generate_series(i * n // nf + 1, (i + 1) * n // nf),
                j -> unicode(text[j]))), 0) % 2147483648 AS BIGINT) AS frame_checksum
FROM frames WHERE i % {every_k} = 0
"""


def multimodal_features(docs: DataFrame) -> DataFrame:
    """documents → binary payload → fake-decoded features (end-to-end)."""
    return extract_features(with_binary_payload(docs))


def multimodal_features_oracle_sql() -> str:
    # Mirrors fake_decode's arithmetic in SQL over the same utf-8 bytes.
    # The byte-sum checksum is expressed as a codepoint sum, which equals the
    # byte sum for ASCII text (the synthetic documents are ASCII; asserted in
    # tests).
    return """
WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n, text FROM documents)
SELECT doc_id,
       CAST(n AS INT) AS n_bytes,
       CAST(n % 640 + 1 AS INT) AS width,
       CAST(n % 480 + 1 AS INT) AS height,
       CAST(n % 30 + 1 AS INT) AS n_frames,
       CAST(list_sum(list_transform(generate_series(1, length(text)),
                                    i -> unicode(text[i]))) % 2147483648 AS BIGINT) AS checksum
FROM b
"""
