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
from pyspark.sql import DataFrame, Window, functions as F

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

    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # Whole-batch vectorization (r14): all payloads join into ONE
            # buffer with ONE prefix sum, so every sampled chunk's
            # checksum is a two-element subtraction and the frame bounds
            # (i*n//nf per the fake frame model) come from flat array
            # arithmetic. The per-byte Python sum(chunk) this replaces was
            # the kernel's whole cost; a per-DOC numpy pass was tried
            # first and measured SLOWER than the loop on small payloads
            # (per-doc allocation overhead) — batch-level is the level
            # that pays.
            payloads = pdf["payload"].tolist()
            doc_ids = np.asarray(pdf["doc_id"].values, dtype=np.int64)
            n_docs = len(payloads)
            lens = np.fromiter(
                (len(p) for p in payloads), dtype=np.int64, count=n_docs
            )
            nf = lens % 30 + 1
            cnt = (nf + every_k - 1) // every_k  # sampled frames per doc
            total = int(cnt.sum())
            doc_off = np.zeros(n_docs + 1, dtype=np.int64)
            np.cumsum(lens, out=doc_off[1:])
            d = np.repeat(np.arange(n_docs), cnt)
            start = np.zeros(n_docs + 1, dtype=np.int64)
            np.cumsum(cnt, out=start[1:])
            fi = (np.arange(total, dtype=np.int64) - start[d]) * every_k
            n_d, nf_d = lens[d], nf[d]
            lo = fi * n_d // nf_d
            hi = (fi + 1) * n_d // nf_d
            base = doc_off[d]
            # chunk sums via one reduceat pass with int64 accumulation
            # (an int64 prefix-sum variant was tried and measured 3x
            # slower — it writes 8 bytes per input byte). The trailing
            # sentinel byte keeps every end index < len; empty chunks
            # (reduceat quirk: start==end yields arr[start]) are masked
            # to 0 after.
            buf = np.frombuffer(b"".join(payloads) + b"\0", dtype=np.uint8)
            idx = np.empty(2 * total, dtype=np.int64)
            idx[0::2] = base + lo
            idx[1::2] = base + hi
            sums = np.add.reduceat(buf, idx, dtype=np.int64)[0::2]
            np.putmask(sums, lo == hi, 0)
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids[d],
                    "frame_idx": fi,
                    "frame_len": hi - lo,
                    "frame_checksum": sums % (1 << 31),
                }
            )

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


# 32-bit fake perceptual hash: wide enough that the 8-bit LSH bands give
# 4 x 256 buckets (a 16-bit hash's 4-bit bands collapse to 64 buckets —
# every bucket overflows the cap once the corpus passes a few thousand
# rows and the join silently finds nothing); a production pHash would be
# 64-bit with the same banding
PHASH_BITS = 32
PHASH_CHUNK_HEX = 16  # 8 payload bytes per voting chunk
PHASH_BANDS = 4  # 8 bits per band; pigeonhole covers hamming <= 3


def media_phash(media: DataFrame) -> DataFrame:
    """Deterministic stand-in perceptual hash over the binary payload:
    the payload's hex encoding is cut into 8-byte chunks, each chunk's
    md5 votes on ``PHASH_BITS`` bits (simhash-style bit votes — similar
    payloads share most chunks, so their hashes land within a small
    hamming distance). The md5 family keeps every stage reproducible in
    DuckDB (the same oracle trick as :func:`dedup.simhash48_md5`); a
    real pHash would slot into the decode seam (``real_decode``).

    Scale shape: narrow per-row map (hex + substring chunking via one
    sequence explode) and ONE media-keyed vote aggregation."""
    chunks = (
        media.select("doc_id", F.hex(F.col("payload")).alias("hx"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, (length(hx) - 1) div {PHASH_CHUNK_HEX}),"
                    f" i -> substring(hx, i * {PHASH_CHUNK_HEX} + 1, {PHASH_CHUNK_HEX}))"
                )
            ).alias("chunk"),
        )
        .select("doc_id", F.md5("chunk").alias("h"))
    )
    digits = chunks.select(
        "doc_id",
        *[
            F.conv(F.substring("h", i + 1, 1), 16, 10)
            .cast("int")
            .alias(f"d{i}")
            for i in range(PHASH_BITS // 4)
        ],
    )
    votes = digits.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col(f"d{b // 4}"), b % 4).bitwiseAND(
                        F.lit(1)
                    )
                    == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(PHASH_BITS)
        ]
    )
    fp = sum(
        (
            F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
            for b in range(1, PHASH_BITS)
        ),
        F.when(F.col("b0") > 0, F.lit(1)).otherwise(F.lit(0)),
    )
    return votes.select("doc_id", fp.cast("long").alias("phash"))


def media_phash_near_dup(
    docs: DataFrame,
    max_hamming: int = 3,
    max_bucket_size: int = 64,
) -> DataFrame:
    """Near-duplicate media pairs by perceptual-hash hamming distance,
    via banded LSH — NOT an all-pairs comparison.

    The 32-bit phash splits into ``PHASH_BANDS`` 8-bit bands; by the
    pigeonhole principle any pair within hamming ``max_hamming`` (< the
    band count) agrees exactly on at least one band, so candidates come
    from an equi-join on (band index, band value), viral buckets capped
    at ``max_bucket_size``, and only candidates pay the exact
    ``bit_count(xor)`` verify — the same bucket-join discipline as the
    MinHash pipeline (:func:`dedup.minhash_lsh_candidate_pairs`).

    Output: ``doc_a < doc_b, hamming`` for verified pairs."""
    ph = media_phash(with_binary_payload(docs))
    bands = ph.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("phash"), 8 * i)
                        .bitwiseAND(F.lit(255))
                        .alias("val"),
                    )
                    for i in range(PHASH_BANDS)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "phash", "bv.band", "bv.val")
    sized = bands.withColumn(
        "bucket_n",
        F.count(F.lit(1)).over(Window.partitionBy("band", "val")),
    ).filter(F.col("bucket_n") <= max_bucket_size)
    a = sized.select(
        F.col("band"),
        F.col("val"),
        F.col("doc_id").alias("doc_a"),
        F.col("phash").alias("ph_a"),
    )
    b = sized.select(
        F.col("band"),
        F.col("val"),
        F.col("doc_id").alias("doc_b"),
        F.col("phash").alias("ph_b"),
    )
    pairs = (
        a.join(b, ["band", "val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "ph_a", "ph_b")
        .distinct()
    )
    ham = F.bit_count(
        F.col("ph_a").bitwiseXOR(F.col("ph_b"))
    ).cast("int")
    return (
        pairs.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


def media_phash_near_dup_oracle_sql(
    max_hamming: int = 3, max_bucket_size: int = 64
) -> str:
    nd = PHASH_BITS // 4
    digits = ",\n         ".join(
        f"strpos('0123456789abcdef', substr(h, {i + 1}, 1)) - 1 AS d{i}"
        for i in range(nd)
    )
    votes = ",\n         ".join(
        f"sum(CASE WHEN (d{b // 4} >> {b % 4}) & 1 = 1 THEN 1 ELSE -1 END)"
        f" AS b{b}"
        for b in range(PHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(PHASH_BITS)
    )
    bands = " UNION ALL ".join(
        f"SELECT doc_id, phash, {i} AS band,"
        f" (phash >> {8 * i}) & 255 AS val FROM f"
        for i in range(PHASH_BANDS)
    )
    return f"""
WITH hx AS (
  SELECT doc_id, hex(encode(text)) AS hx FROM documents
), c AS (
  -- LATERAL range unnest, NOT list_transform: DuckDB v1.0 computes list
  -- lambdas over rows of unequal lengths incorrectly (SCALE.md hazard)
  SELECT doc_id,
         substr(hx, r.i * {PHASH_CHUNK_HEX} + 1, {PHASH_CHUNK_HEX}) AS chunk
  FROM hx, LATERAL (
    SELECT unnest(range(0, (length(hx) - 1) // {PHASH_CHUNK_HEX} + 1)) AS i
  ) r
), h AS (
  SELECT doc_id, md5(chunk) AS h FROM c
), d AS (
  SELECT doc_id,
         {digits}
  FROM h
), v AS (
  SELECT doc_id,
         {votes}
  FROM d GROUP BY doc_id
), f AS (
  SELECT doc_id, CAST({fp} AS BIGINT) AS phash FROM v
), bands AS (
  {bands}
), sized AS (
  SELECT * FROM (
    SELECT *, count(*) OVER (PARTITION BY band, val) AS bucket_n FROM bands)
  WHERE bucket_n <= {max_bucket_size}
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.phash AS ph_a, b.phash AS ph_b
  FROM sized a JOIN sized b ON a.band = b.band AND a.val = b.val
  WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(ph_a, ph_b)) AS INTEGER) AS hamming
FROM pairs WHERE bit_count(xor(ph_a, ph_b)) <= {max_hamming}
ORDER BY doc_a, doc_b"""


AUDIO_SCHEMA = "doc_id long, win_idx int, energy long, voiced boolean"


def audio_energy_windows(
    media: DataFrame, win: int = 32, threshold: int = 60000
) -> DataFrame:
    """Framed audio-energy extraction (the VAD / silence-trim kernel):
    treat the opaque payload as 8-bit PCM, cut it into non-overlapping
    ``win``-sample frames (trailing partial frame dropped, as a real
    framer does), and emit each frame's integer energy
    ``sum((sample-128)^2)`` plus a voiced flag at ``threshold``.

    Same plumbing contract as the image/video kernels above: Arrow-batched
    ``mapInPandas``, numpy-vectorized per batch (one frombuffer + reshape
    per payload — no Python per-sample loop), partition-streaming so a
    100 TB audio corpus processes at bounded memory. The energy kernel is
    pure integer arithmetic, so the whole frame stream is cross-engine
    checkable — unusual for a media pipeline, and exactly why the fake
    payload keeps the real decode seam (`real_decode`) separate."""
    import numpy as np

    def run(batches):
        for pdf in batches:
            ids, wins, energies = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                a = np.frombuffer(payload, dtype=np.uint8)
                n = (len(a) // win) * win
                if n == 0:
                    continue
                d = a[:n].astype(np.int64) - 128
                e = (d * d).reshape(-1, win).sum(axis=1)
                ids.append(np.full(len(e), doc_id, dtype=np.int64))
                wins.append(np.arange(len(e), dtype=np.int64))
                energies.append(e)
            if ids:
                e = np.concatenate(energies)
                yield pd.DataFrame(
                    {
                        "doc_id": np.concatenate(ids),
                        "win_idx": np.concatenate(wins),
                        "energy": e,
                        "voiced": e > threshold,
                    }
                )

    return media.mapInPandas(run, schema=AUDIO_SCHEMA)


def audio_vad_summary(
    docs: DataFrame, win: int = 32, threshold: int = 60000, top: int = 20
) -> DataFrame:
    """Per-doc VAD rollup over the framed energies: voiced-frame count,
    total frames, and peak frame energy for the ``top`` docs by voiced
    count (ties: doc_id). The headline audio-curation statistic — how
    much of each clip is signal vs silence."""
    frames = audio_energy_windows(with_binary_payload(docs), win, threshold)
    return (
        frames.groupBy("doc_id")
        .agg(
            F.sum(F.col("voiced").cast("long")).alias("n_voiced"),
            F.count("*").alias("n_frames"),
            F.max("energy").alias("peak_energy"),
        )
        .orderBy(F.desc("n_voiced"), F.asc("doc_id"))
        .limit(top)
    )


def audio_vad_summary_oracle_sql(
    win: int = 32, threshold: int = 60000, top: int = 20
) -> str:
    """The same framed integer-energy kernel in SQL: the payload is the
    utf-8 text bytes and the corpus text is ASCII, so ``ascii(substr)``
    recovers each byte. Frame f covers 1-based byte positions
    [f*win+1, (f+1)*win]."""
    return f"""
WITH frames AS (
  SELECT doc_id, f AS win_idx,
         CAST((SELECT sum((ascii(substr(d.text, p, 1)) - 128)
                      * (ascii(substr(d.text, p, 1)) - 128))
               FROM unnest(generate_series(f * {win} + 1, (f + 1) * {win}))
                 AS u(p)
              ) AS BIGINT) AS energy
  FROM documents d,
       unnest(generate_series(0, CAST(length(text) // {win} AS INTEGER) - 1))
         AS w(f)
  WHERE length(text) >= {win}
)
SELECT doc_id,
       CAST(sum(CASE WHEN energy > {threshold} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_voiced,
       count(*) AS n_frames,
       max(energy) AS peak_energy
FROM frames GROUP BY doc_id
ORDER BY n_voiced DESC, doc_id ASC LIMIT {top}
"""


SCENE_SCHEMA = "doc_id long, frame_idx long, fsum long"


def video_frame_signatures(media: DataFrame, frame_len: int = 64) -> DataFrame:
    """Per-frame integer signature extraction (the scene-cut kernel's
    front half): treat the opaque payload as a raw frame stream, cut it
    into non-overlapping ``frame_len``-byte frames (trailing partial frame
    dropped) and emit each frame's byte SUM — the cheapest luminance
    proxy a real decoder would hand back per frame.

    Same plumbing contract as :func:`audio_energy_windows`: Arrow-batched
    ``mapInPandas``, numpy-vectorized per batch (one frombuffer + reshape
    per payload, no per-byte Python), partition-streaming so a 100 TB
    video corpus processes at bounded memory. A real decoder drops in at
    the payload→array seam (`real_decode`); the signature arithmetic and
    every stage above it are engine-checkable integers."""
    import numpy as np

    def run(batches):
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                a = np.frombuffer(payload, dtype=np.uint8)
                n = (len(a) // frame_len) * frame_len
                if n == 0:
                    continue
                s = a[:n].astype(np.int64).reshape(-1, frame_len).sum(axis=1)
                ids.append(np.full(len(s), doc_id, dtype=np.int64))
                idxs.append(np.arange(len(s), dtype=np.int64))
                sums.append(s)
            if ids:
                yield pd.DataFrame(
                    {
                        "doc_id": np.concatenate(ids),
                        "frame_idx": np.concatenate(idxs),
                        "fsum": np.concatenate(sums),
                    }
                )

    return media.mapInPandas(run, schema=SCENE_SCHEMA)


def video_scene_cuts(
    docs: DataFrame,
    frame_len: int = 64,
    threshold: int = 600,
    top: int = 20,
) -> DataFrame:
    """Scene-cut report per video: a cut is a frame whose signature jumps
    by more than ``threshold`` from the previous frame (the classic
    inter-frame-difference shot detector). Reports, for the ``top`` docs
    by cut count (ties: doc_id), the frame count, cut count, and the
    maximum inter-frame delta. The kernel emits per-frame rows; the
    delta/lag and the rollup are plain window + agg — Spark-side, so the
    per-frame stream never concentrates on one machine.

    Scale shape: the lag window partitions BY DOC (each video's frames
    sort locally — the natural key; no global sort), the rollup is one
    map-side-combined agg, and the top-k is a TakeOrdered. All integer."""
    frames = video_frame_signatures(with_binary_payload(docs), frame_len)
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    deltas = frames.withColumn(
        "delta", F.abs(F.col("fsum") - F.lag("fsum").over(w))
    )
    return (
        deltas.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum(
                (F.coalesce(F.col("delta"), F.lit(0)) > threshold).cast(
                    "bigint"
                )
            ).alias("n_cuts"),
            F.coalesce(F.max("delta"), F.lit(0)).cast("long").alias(
                "max_delta"
            ),
        )
        .orderBy(F.desc("n_cuts"), F.asc("doc_id"))
        .limit(top)
    )


def video_scene_cuts_oracle_sql(
    frame_len: int = 64, threshold: int = 600, top: int = 20
) -> str:
    """The same framed byte-sum kernel in SQL: the payload is the utf-8
    text bytes and the corpus text is ASCII, so ``ascii(substr)`` recovers
    each byte; frame f covers 1-based byte positions
    [f*frame_len+1, (f+1)*frame_len]."""
    return f"""
WITH frames AS (
  SELECT doc_id, f AS frame_idx,
         CAST((SELECT sum(ascii(substr(d.text, p, 1)))
               FROM unnest(generate_series(f * {frame_len} + 1,
                                           (f + 1) * {frame_len}))
                 AS u(p)
              ) AS BIGINT) AS fsum
  FROM documents d,
       unnest(generate_series(
         0, CAST(length(text) // {frame_len} AS INTEGER) - 1)) AS w(f)
  WHERE length(text) >= {frame_len}
), deltas AS (
  SELECT doc_id,
         abs(fsum - lag(fsum) OVER (PARTITION BY doc_id ORDER BY frame_idx))
           AS delta
  FROM frames
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_frames,
       CAST(sum(CASE WHEN coalesce(delta, 0) > {threshold} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_cuts,
       CAST(coalesce(max(delta), 0) AS BIGINT) AS max_delta
FROM deltas GROUP BY doc_id
ORDER BY n_cuts DESC, doc_id ASC LIMIT {top}
"""


TILE_SCHEMA = "doc_id long, tile int, tsum long"


def image_tile_sums(
    media: DataFrame, side: int = 16, grid: int = 4
) -> DataFrame:
    """Per-tile integer pooling over the payload viewed as a ``side``×
    ``side`` 8-bit image cut into a ``grid``×``grid`` tile grid (the
    grid-pooling step of patch-based vision preprocessing). Payloads
    shorter than side² bytes produce no rows (a real loader would pad or
    reject; the framer's drop contract matches the audio/video kernels).

    Same plumbing contract as the audio/video kernels: Arrow-batched
    ``mapInPandas``, one frombuffer + 4-D reshape + axis-sum per payload
    (no per-pixel Python), partition streaming. Integer sums end to end,
    so the tile stream is cross-engine checkable."""
    import numpy as np

    t = side // grid

    def run(batches):
        for pdf in batches:
            ids, tiles, sums = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                a = np.frombuffer(payload, dtype=np.uint8)
                if len(a) < side * side:
                    continue
                img = a[: side * side].astype(np.int64).reshape(side, side)
                ts = img.reshape(grid, t, grid, t).sum(axis=(1, 3)).ravel()
                ids.append(np.full(len(ts), doc_id, dtype=np.int64))
                tiles.append(np.arange(len(ts), dtype=np.int64))
                sums.append(ts)
            if ids:
                yield pd.DataFrame(
                    {
                        "doc_id": np.concatenate(ids),
                        "tile": np.concatenate(tiles).astype("int32"),
                        "tsum": np.concatenate(sums),
                    }
                )

    return media.mapInPandas(run, schema=TILE_SCHEMA)


def image_tile_contrast(
    docs: DataFrame, side: int = 16, grid: int = 4, top: int = 20
) -> DataFrame:
    """Tile-contrast report per image: brightest-tile index (ties: lowest
    index), plus the max-min tile-sum spread — the cheap "is there
    structure or is it flat" screen a vision-data curation pass runs
    before spending decode budget. Top ``top`` docs by (contrast desc,
    doc_id)."""
    tiles = image_tile_sums(with_binary_payload(docs), side, grid)
    ranked = tiles.withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(
                F.desc("tsum"), F.asc("tile")
            )
        ),
    )
    per_doc = ranked.groupBy("doc_id").agg(
        F.max("tsum").alias("max_tile_sum"),
        F.min("tsum").alias("min_tile_sum"),
        F.max(F.when(F.col("rk") == 1, F.col("tile"))).alias(
            "brightest_tile"
        ),
    )
    return (
        per_doc.select(
            "doc_id",
            "brightest_tile",
            "max_tile_sum",
            (F.col("max_tile_sum") - F.col("min_tile_sum")).alias(
                "contrast"
            ),
        )
        .orderBy(F.desc("contrast"), F.asc("doc_id"))
        .limit(top)
    )


def image_tile_contrast_oracle_sql(
    side: int = 16, grid: int = 4, top: int = 20
) -> str:
    """The same tile pooling in SQL: byte p (0-based) of the side×side
    image belongs to tile (p DIV side DIV t)*grid + (p % side) DIV t."""
    t = side // grid
    return f"""
WITH tiles AS (
  SELECT doc_id,
         CAST(((p // {side}) // {t}) * {grid} + (p % {side}) // {t} AS INT)
           AS tile,
         CAST(sum(ascii(substr(d.text, p + 1, 1))) AS BIGINT) AS tsum
  FROM documents d,
       unnest(generate_series(0, {side * side - 1})) AS u(p)
  WHERE length(text) >= {side * side}
  GROUP BY doc_id, 2
), ranked AS (
  SELECT doc_id, tile, tsum,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY tsum DESC, tile ASC) AS rk
  FROM tiles
), per_doc AS (
  SELECT doc_id, max(tsum) AS max_tile_sum, min(tsum) AS min_tile_sum,
         max(CASE WHEN rk = 1 THEN tile END) AS brightest_tile
  FROM ranked GROUP BY doc_id
)
SELECT doc_id, brightest_tile, max_tile_sum,
       CAST(max_tile_sum - min_tile_sum AS BIGINT) AS contrast
FROM per_doc ORDER BY contrast DESC, doc_id ASC LIMIT {top}
"""


AUDIO_TARGET_MS = 4000  # target mean-square (power) for normalization


def audio_gain_table(
    docs: DataFrame, target_ms: int = AUDIO_TARGET_MS
) -> DataFrame:
    """Loudness-normalization PLANNING table (the batch front half of an
    audio ingest's gain stage): per clip, the exact integer mean-square
    power of the 8-bit PCM payload and the POWER gain (ppm) that would
    bring it to ``target_ms`` — ``gain = target / ms`` in the power
    domain, which stays exact-integer; the amplitude gain is its square
    root and belongs to the (float) DSP stage applying it, not to the
    plan. ``needs_attenuation`` flags clips already louder than target.
    Same Arrow-batched plumbing contract as the other media kernels:
    numpy per batch, no per-sample Python, partition-streaming.

    Scale shape (100 TB): one mapInPandas pass emitting one row per clip
    (never per sample); the table IS the rollup — no further shuffle."""
    import numpy as np

    def run(batches):
        for pdf in batches:
            ids, ns, mss = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                a = np.frombuffer(payload, dtype=np.uint8)
                if len(a) == 0:
                    continue
                d = a.astype(np.int64) - 128
                e = int((d * d).sum())
                ids.append(doc_id)
                ns.append(len(a))
                mss.append(e // len(a))
            if ids:
                yield pd.DataFrame(
                    {
                        "doc_id": np.array(ids, dtype=np.int64),
                        "n_samples": np.array(ns, dtype=np.int64),
                        "mean_square": np.array(mss, dtype=np.int64),
                    }
                )

    table = with_binary_payload(docs).mapInPandas(
        run, schema="doc_id long, n_samples long, mean_square long"
    )
    return (
        table.select(
            "doc_id",
            "n_samples",
            "mean_square",
            F.expr(
                f"CAST(CASE WHEN mean_square > 0"
                f" THEN CAST({target_ms} AS BIGINT) * 1000000"
                f" div mean_square"
                f" ELSE 0 END AS BIGINT)"
            ).alias("power_gain_ppm"),
            F.expr(
                f"mean_square > {target_ms}"
            ).alias("needs_attenuation"),
        )
        .orderBy("doc_id")
    )


def audio_gain_table_oracle_sql(target_ms: int = AUDIO_TARGET_MS) -> str:
    """Same kernel in SQL: the fake payload is the utf-8 text bytes and
    the corpus text is ASCII, so ascii(substr) recovers each byte."""
    return f"""
WITH clip AS (
  SELECT doc_id, CAST(length(text) AS BIGINT) AS n_samples,
         CAST((SELECT sum((ascii(substr(d.text, p, 1)) - 128)
                      * (ascii(substr(d.text, p, 1)) - 128))
               FROM unnest(generate_series(1, length(d.text))) AS u(p)
              ) AS BIGINT) AS energy
  FROM documents d WHERE length(text) > 0
), ms AS (
  SELECT doc_id, n_samples, energy // n_samples AS mean_square FROM clip
)
SELECT doc_id, n_samples, mean_square,
       CAST(CASE WHEN mean_square > 0
            THEN CAST({target_ms} AS BIGINT) * 1000000 // mean_square
            ELSE 0 END AS BIGINT) AS power_gain_ppm,
       mean_square > {target_ms} AS needs_attenuation
FROM ms ORDER BY doc_id"""
