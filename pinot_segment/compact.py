"""Segment merge (compaction) at the storage layer.

The streaming sink lands one segment set per micro-batch, so a long-lived
REALTIME-style table accumulates many small segments — the classic
small-file problem. Pinot solves it server-side with minion merge tasks;
the reference engine has no write path at all (README.md:418), so this is
a beyond-parity maintenance primitive: read N member segments, concatenate
their columns, and write ONE segment that preserves each column's
physical configuration (RAW vs dictionary, multi-value, nullability,
inverted index, bloom filter). Sortedness is *re-detected* by the writer —
merging segments whose sort-key ranges are disjoint and ordered yields a
sorted merged segment; anything else correctly loses the flag.

Orchestration (grouping, distribution, commit/rename, manifest upkeep)
lives in datafusion_pinot_spark/maintenance.py — this module is Spark-free
so it is testable at the byte level and usable from any runner.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from pinot_segment.errors import UnsupportedFeatureError
from pinot_segment.metadata import DataType
from pinot_segment.segment_reader import SegmentReader
from pinot_segment.var_byte import LZ4_LENGTH_PREFIXED, PASS_THROUGH
from pinot_segment.writer import ColumnSpec, write_segment


def merge_segments(
    member_dirs: list[str],
    segment_dir: str | Path,
    segment_name: str,
    table_name: str,
) -> Path:
    """Merge the member v3 segments (in the given order) into one segment
    at ``segment_dir``; returns the new v3 path. Raises if the members'
    schemas (column set, types, SV/MV) disagree. RAW STRING/BYTES columns
    re-compress with the sink's default codec (LZ4 length-prefixed); the
    original per-chunk codec is not part of the logical schema."""
    readers = [SegmentReader.open(d) for d in member_dirs]
    base_cols = readers[0].column_names()
    for r in readers[1:]:
        if r.column_names() != base_cols:
            raise UnsupportedFeatureError(
                f"cannot merge segments with different columns: "
                f"{base_cols} vs {r.column_names()}"
            )

    specs = []
    for name in base_cols:
        metas = [r.metadata.get_column(name) for r in readers]
        dt = metas[0].data_type
        raw = not metas[0].has_dictionary
        mv = not metas[0].is_single_value
        for m in metas[1:]:
            if (
                m.data_type is not dt
                or (not m.has_dictionary) != raw
                or (not m.is_single_value) != mv
            ):
                raise UnsupportedFeatureError(
                    f"cannot merge: column '{name}' has inconsistent "
                    "physical type across members"
                )
        # Index configuration is a union: if ANY member carried the index
        # the merged segment keeps it (a fleet rollout mid-stream must not
        # silently drop indexes), constrained to where it is valid.
        inverted = any(m.has_inverted_index for m in metas) and not raw and not mv
        bloomed = any(m.has_bloom_filter for m in metas) and not mv
        has_nulls = any(m.has_null_values for m in metas)
        # partition metadata survives only when every member agrees on the
        # (function, modulus) — the writer recomputes the merged residues
        partition_config = None
        if (
            metas[0].partition_function is not None
            and all(
                m.partition_function == metas[0].partition_function
                and m.num_partitions == metas[0].num_partitions
                for m in metas
            )
        ):
            partition_config = (
                metas[0].partition_function,
                metas[0].num_partitions,
            )

        parts = [r.read_column(name) for r in readers]
        if mv:
            values = [row for part in parts for row in part]
        elif isinstance(parts[0], np.ndarray):
            values = np.concatenate(parts)
        else:
            values = [v for part in parts for v in part]
        null_mask = None
        if has_nulls:
            null_mask = np.concatenate(
                [
                    (
                        nm
                        if (nm := r.null_mask(name)) is not None
                        else np.zeros(r.total_docs(), dtype=bool)
                    )
                    for r in readers
                ]
            )
        compression = (
            LZ4_LENGTH_PREFIXED
            if raw and dt in (DataType.STRING, DataType.BYTES)
            else PASS_THROUGH
        )
        specs.append(
            ColumnSpec(
                name,
                dt,
                values,
                raw=raw,
                compression=compression,
                multi_value=mv,
                null_mask=null_mask,
                inverted=inverted,
                bloom=bloomed,
                partition_config=partition_config,
            )
        )
    return write_segment(segment_dir, segment_name, table_name, specs)
