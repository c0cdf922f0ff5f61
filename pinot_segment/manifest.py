"""Table-level segment-stats manifest: O(1) planning metadata.

Zone-map pruning and the hybrid time-boundary lookup both need per-segment,
per-column (min, max, has_nulls) stats. Reading them by opening a
``SegmentReader`` per segment is fine for tens of segments but is a
driver-side linear walk of N file opens at planning time — at 10^5 segments
(100 TB-scale tables) that alone dominates query latency. This manifest
caches those stats in ONE json file per table directory:

    {table_dir}/segment_stats.json
    {"version": 1, "segments": {"<seg>": {"fingerprint": ..., "total_docs":
      N, "columns": {"<col>": {"dtype": "...", "min": ..., "max": ...,
      "has_nulls": false}}}}}

Staleness is detected per segment via a (size, mtime_ns) fingerprint of its
``metadata.properties`` — a manifest that doesn't cover the exact current
segment set, or whose fingerprints drifted, is ignored (callers fall back to
opening readers, and may rewrite the manifest). The Spark sink computes the
stats in the write tasks (where the data already is — no extra scan) and the
driver-side commit merges them in, so sink-written tables always plan O(1).

No counterpart in the reference, which re-opens segment metadata per query
(metadata_provider.rs:104-212) and ignores filters entirely (table.rs:163).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Optional

MANIFEST_NAME = "segment_stats.json"
VERSION = 1

# column dtypes whose min/max are meaningful + json-safe
_STATS_DTYPES = {"INT", "LONG", "FLOAT", "DOUBLE", "STRING", "TIMESTAMP"}


# (path -> ((size, mtime_ns), fingerprint)): manifest verification runs on
# EVERY planning pass, and re-reading + md5-hashing metadata.properties per
# segment per query showed up in the marginal count_star bench (~0.5 ms per
# segment of open/read/hash/Python overhead x 128 segments). Within one
# driver process a segment whose (size, mtime_ns) is unchanged keeps its
# hash; the cross-PROCESS guarantee — detecting mtime-preserving
# replacement done by offline tooling between runs, the scenario the
# content hash exists for — is unaffected, because a fresh process starts
# with an empty cache and hashes everything once.
_FP_CACHE: dict = {}


def _fingerprint(v3_dir: str) -> Optional[list]:
    """[size, mtime_ns, md5(metadata.properties)]. The content hash guards
    against mtime-preserving replacement (cp -p / rsync -a / copytree) with
    same-size metadata, where a (size, mtime) pair alone would let stale
    zone maps silently prune segments that now contain matching rows. The
    file is small (~1-4 KB); the digest is cached per process keyed on the
    stat pair so steady-state planning pays one os.stat per segment."""
    import hashlib

    path = os.path.join(v3_dir, "metadata.properties")
    try:
        st = os.stat(path)
        key = (st.st_size, st.st_mtime_ns)
        cached = _FP_CACHE.get(path)
        if cached is not None and cached[0] == key:
            return cached[1]
        with open(path, "rb") as f:
            digest = hashlib.md5(f.read()).hexdigest()
    except OSError:
        return None
    fp = [st.st_size, st.st_mtime_ns, digest]
    _FP_CACHE[path] = (key, fp)
    return fp


def collect_segment_stats(v3_dir: str) -> dict:
    """Stats for one segment by opening it (the slow path the manifest
    amortizes; used to build/refresh manifests and as the per-segment
    fallback)."""
    from pinot_segment import SegmentReader

    reader = SegmentReader.open(v3_dir)
    cols = {}
    for name, cm in reader.metadata.columns.items():
        entry: dict = {
            "dtype": cm.data_type.value,
            "has_nulls": bool(cm.has_null_values),
            # dictionary layout facts: a dict-encoded null-free column's
            # dictionary IS its distinct value set, so planning can serve
            # exact-distinct questions from these two fields alone
            # (operators/segment_distinct.py) without touching data
            "has_dictionary": bool(cm.has_dictionary),
            "cardinality": int(cm.cardinality),
        }
        cols[name] = entry
        if not cm.is_single_value:
            # MV columns get a stats-free entry (r11): schema() needs the
            # COMPLETE column census per segment so evolution (a segment
            # missing a requested column -> NULL-filled -> must be
            # nullable) is answerable from the one manifest read; before
            # this, any MV table fell back to a per-segment metadata parse
            # at planning time. No min/max: zone-map pruning treats the
            # entry as no-stats and conservatively keeps the segment.
            entry["is_single_value"] = False
            continue
        if cm.data_type.value not in _STATS_DTYPES:
            # no meaningful/json-safe min-max, but the entry still carries
            # dtype + nullability (schema() derives table-level
            # nullability from the manifest without opening segments)
            continue
        mm = reader.column_min_max(name)
        if mm is not None:
            # numpy scalars from dictionary min/max are not json-safe
            entry["min"], entry["max"] = (
                v.item() if hasattr(v, "item") else v for v in mm
            )
        if cm.partition_function:
            # partition map (writer.py emit_partition_map): lets planning
            # prune by residue class without opening the segment
            entry["partitions"] = {
                "function": cm.partition_function,
                "num": cm.num_partitions,
                "values": list(cm.partition_values),
            }
    return {
        "fingerprint": _fingerprint(v3_dir),
        "total_docs": reader.total_docs(),
        "columns": cols,
        # the columns map above is the segment's COMPLETE column census
        # (r12): planning may treat a requested column ABSENT from it as
        # one the segment predates (evolution NULL-fill) without falling
        # back to a metadata.properties parse. Entries written before this
        # marker existed stay conservative (the census re-parses them).
        "all_columns": True,
    }


def _segment_v3_dirs(table_dir: str) -> list[str]:
    segs = []
    for entry in sorted(os.listdir(table_dir)):
        if entry == "tmp":
            continue
        v3 = os.path.join(table_dir, entry, "v3")
        if os.path.isdir(v3):
            segs.append(v3)
    return segs


def build_manifest(table_dir: str) -> dict:
    """Open every segment once and assemble the manifest dict."""
    return {
        "version": VERSION,
        "segments": {
            _seg_key(v3): collect_segment_stats(v3)
            for v3 in _segment_v3_dirs(table_dir)
        },
    }


def _seg_key(v3_dir: str) -> str:
    # key by the segment directory name (the parent of v3/)
    return os.path.basename(os.path.dirname(v3_dir))


def write_manifest(table_dir: str, manifest: dict) -> str:
    """Atomic write (tmp file + rename) so concurrent readers never see a
    torn manifest."""
    path = os.path.join(table_dir, MANIFEST_NAME)
    fd, tmp = tempfile.mkstemp(
        prefix=".segment_stats_", suffix=".json", dir=table_dir
    )
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return path


def refresh_manifest(table_dir: str) -> Optional[str]:
    """Build + write, best-effort (read-only table dirs are fine to serve
    without a manifest)."""
    try:
        return write_manifest(table_dir, build_manifest(table_dir))
    except OSError:
        return None


def load_manifest(table_dir: str, verify: bool = True) -> Optional[dict]:
    """The manifest's segments dict, or None when missing/stale.

    ``verify`` checks every listed segment's fingerprint AND that the
    manifest covers the exact current segment set — a manifest is only
    trusted when it describes the table as it exists now."""
    path = os.path.join(table_dir, MANIFEST_NAME)
    try:
        with open(path) as f:
            manifest = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
    if manifest.get("version") != VERSION:
        return None
    segments = manifest.get("segments", {})
    if verify:
        current = {_seg_key(v3): v3 for v3 in _segment_v3_dirs(table_dir)}
        if set(segments) != set(current):
            return None
        for key, stats in segments.items():
            if stats.get("fingerprint") != _fingerprint(current[key]):
                return None
    return segments


def stats_for_segments(v3_dirs) -> dict:
    """Map each v3 segment dir to its manifest stats, loading each table
    dir's manifest at most once and verifying ONLY the requested segments'
    fingerprints (r13 advice): a count task serving ~31k segments of a
    1M-segment table must not stat + md5 the other 969k per worker — the
    per-segment fingerprint pins exactly the metadata bytes the stats were
    collected from, so staleness elsewhere in the table cannot poison a
    verified entry. A requested segment missing from the manifest, or whose
    fingerprint changed, maps to None — the caller opens those (and only
    those). Whole-table coverage checking stays in
    ``load_manifest(verify=True)`` for callers that trust the manifest's
    segment LIST itself (distinct router, maintenance, verify)."""
    out: dict = {}
    by_table: dict = {}
    for v3 in v3_dirs:
        by_table.setdefault(os.path.dirname(os.path.dirname(v3)), []).append(v3)
    for table_dir, segs in by_table.items():
        manifest = load_manifest(table_dir, verify=False)
        for v3 in segs:
            stats = None if manifest is None else manifest.get(_seg_key(v3))
            if stats is not None and stats.get("fingerprint") != _fingerprint(v3):
                stats = None
            out[v3] = stats
    return out
