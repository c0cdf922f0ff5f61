"""Manifest-keyed query-result cache (Pinot's broker response cache,
driver-side): a query over a Pinot table can reuse its materialized
result for as long as the table's segment set is bit-identical.

The cache key digests, for every segment, the manifest fingerprint of
metadata.properties (size, mtime_ns, md5) PLUS the (size, mtime_ns) of
columns.psf — computed without opening segments — so a data-only
rewrite whose metadata is byte-identical still changes the key. Any
segment added, removed, or rewritten changes the digest; staleness is
structural, not TTL-based. (An mtime-AND-size-preserving in-place data
corruption is the one event this cannot see — the same boundary the
manifest itself documents.) Results persist as parquet
under the cache dir with a staged-rename commit (same discipline as the
segment sink), so concurrent writers of the same key are idempotent.
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def table_state_digest(table_dir: str) -> str:
    """Digest of the table's segment set: (segment key, fingerprint) for
    every v3 dir, no segment opens."""
    from pinot_segment.manifest import _fingerprint, _seg_key, _segment_v3_dirs

    h = hashlib.md5()
    for v3 in sorted(_segment_v3_dirs(table_dir)):
        fp = _fingerprint(v3)
        h.update(_seg_key(v3).encode())
        h.update(repr(fp).encode())
        try:
            st = os.stat(os.path.join(v3, "columns.psf"))
            h.update(repr((st.st_size, st.st_mtime_ns)).encode())
        except OSError:
            h.update(b"<no-psf>")
    return h.hexdigest()


def cached_query(
    spark: SparkSession,
    table_dir: str,
    cache_dir: str,
    query_key: str,
    build: "callable",
) -> DataFrame:
    """Return the cached result of ``build(spark)`` for this
    (table state, query_key), materializing it on first use.

    ``build`` must be a function of the table's current segments only —
    the digest cannot see other inputs. The parquet round-trip
    normalizes the result (same as any warehouse result cache); callers
    needing exact logical plans should not cache."""
    digest = hashlib.md5(
        (table_state_digest(table_dir) + "\x00" + query_key).encode()
    ).hexdigest()
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, digest)
    if not os.path.isdir(path):
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        build(spark).write.mode("overwrite").parquet(tmp)
        try:
            os.rename(tmp, path)
        except OSError:
            # a concurrent writer committed the same key first — use theirs
            shutil.rmtree(tmp, ignore_errors=True)
    return spark.read.parquet(path)
