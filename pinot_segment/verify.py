"""Segment integrity verifier: the ops/debugging tool for damaged or
hand-copied segments (reference has no equivalent; Pinot ships
SegmentMetadataCommand / validation jobs for the same need).

``verify_segment(v3_dir)`` returns a list of human-readable findings
(empty = healthy). Checks are layered so a broken early layer doesn't
cascade into noise:

1. layout — the v3 triple exists (metadata.properties, index_map,
   columns.psf);
2. index map — every entry's [startOffset, startOffset+size) lies inside
   columns.psf and entries do not overlap;
3. per column — metadata agrees with the index map (forward index
   present, dictionary present iff hasDictionary, inverted entry present
   iff hasInvertedIndex, no orphan regions for unknown columns) and the
   dictionary magic bytes are intact;
4. decode — every column decodes end-to-end and yields total_docs values
   (the strongest check, optional via ``decode=False`` for huge
   segments).

``verify_table(table_dir)`` runs it across a table and also flags a
stale manifest.
"""

from __future__ import annotations

import os

from pinot_segment.dictionary import MAGIC_MARKER

_DICT_MAGIC = MAGIC_MARKER.to_bytes(8, "big")


def verify_segment(v3_dir: str, decode: bool = True) -> list[str]:
    findings: list[str] = []
    meta_p = os.path.join(v3_dir, "metadata.properties")
    map_p = os.path.join(v3_dir, "index_map")
    psf_p = os.path.join(v3_dir, "columns.psf")
    for p in (meta_p, map_p, psf_p):
        if not os.path.isfile(p):
            findings.append(f"missing file: {os.path.basename(p)}")
    if findings:
        return findings

    from pinot_segment.index_map import IndexMap
    from pinot_segment.metadata import SegmentMetadata

    try:
        meta = SegmentMetadata.from_file(meta_p)
    except Exception as e:
        return [f"metadata.properties unparseable: {e}"]
    try:
        imap = IndexMap.from_file(map_p)
    except Exception as e:
        return [f"index_map unparseable: {e}"]

    psf_size = os.path.getsize(psf_p)
    regions = []
    for (col, kind), loc in sorted(imap.indexes.items()):
        if loc.start_offset < 0 or loc.size < 0:
            findings.append(f"{col}.{kind}: negative offset/size")
            continue
        if loc.start_offset + loc.size > psf_size:
            findings.append(
                f"{col}.{kind}: [{loc.start_offset}, "
                f"{loc.start_offset + loc.size}) exceeds columns.psf "
                f"({psf_size} bytes)"
            )
        regions.append((loc.start_offset, loc.start_offset + loc.size, col, kind))
    regions.sort()
    for (s1, e1, c1, k1), (s2, e2, c2, k2) in zip(regions, regions[1:]):
        if s2 < e1:
            findings.append(
                f"overlapping regions: {c1}.{k1} [{s1},{e1}) and "
                f"{c2}.{k2} [{s2},{e2})"
            )
    if findings:
        return findings

    for col, kind in imap.indexes:
        if col not in meta.columns:
            findings.append(
                f"{col}.{kind}: index region for a column metadata "
                "does not declare"
            )
    for name, cm in meta.columns.items():
        fwd = imap.get_index(name, "forward_index")
        if fwd is None:
            findings.append(f"{name}: no forward_index entry")
            continue
        d = imap.get_index(name, "dictionary")
        if cm.has_dictionary and d is None:
            findings.append(f"{name}: hasDictionary but no dictionary entry")
            continue
        if not cm.has_dictionary and d is not None:
            findings.append(f"{name}: dictionary entry but hasDictionary=false")
        if cm.has_inverted_index and imap.get_index(name, "inverted_index") is None:
            findings.append(
                f"{name}: hasInvertedIndex but no inverted_index entry"
            )
        if d is not None:
            with open(psf_p, "rb") as f:
                f.seek(d.start_offset)
                magic = f.read(8)
            if magic != _DICT_MAGIC:
                findings.append(f"{name}: bad dictionary magic {magic.hex()}")
    if findings:
        return findings

    if decode:
        from pinot_segment.segment_reader import SegmentReader

        try:
            reader = SegmentReader.open(v3_dir)
        except Exception as e:
            return [f"SegmentReader.open failed: {e}"]
        for name in reader.column_names():
            try:
                vals = reader.read_column(name)
            except Exception as e:
                findings.append(f"{name}: decode failed: {e}")
                continue
            n = len(vals)
            if n != meta.total_docs:
                findings.append(
                    f"{name}: decoded {n} values, metadata says "
                    f"{meta.total_docs} docs"
                )
    return findings


def verify_table(table_dir: str, decode: bool = True) -> dict[str, list[str]]:
    """``{segment_v3_dir: findings}`` for every segment (healthy segments
    map to ``[]``), plus a ``"<manifest>"`` key when segment_stats.json
    is stale or missing."""
    from pinot_segment.manifest import _segment_v3_dirs, load_manifest

    out: dict[str, list[str]] = {}
    segs = _segment_v3_dirs(table_dir)
    for v3 in segs:
        out[v3] = verify_segment(v3, decode=decode)
    if segs and load_manifest(table_dir) is None:
        out["<manifest>"] = [
            "segment_stats.json missing or stale — planning falls back to "
            "per-segment opens (refresh with manifest.refresh_manifest)"
        ]
    return out
