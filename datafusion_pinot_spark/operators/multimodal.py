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
