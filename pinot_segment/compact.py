"""Segment merge (compaction) at the storage layer.

The streaming sink lands one segment set per micro-batch, so a long-lived
REALTIME-style table accumulates many small segments — the classic
small-file problem. Pinot solves it server-side with minion merge tasks;
the reference engine has no write path at all (README.md:418), so this is
a beyond-parity maintenance primitive: read N member segments, concatenate
their columns, and write ONE segment that preserves each column's
physical configuration (RAW vs dictionary, multi-value, nullability,
inverted index, bloom filter, partition map). Sortedness is *re-detected*
by the writer — merging segments whose sort-key ranges are disjoint and
ordered yields a sorted merged segment; anything else correctly loses the
flag.

``rollup`` mirrors Pinot's merge-rollup minion task: rows sharing the
dimension values collapse to one, with metric columns aggregated
(sum/min/max). A count is a summed ones-column, exactly Pinot's
convention for rollup-ed count metrics.

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

_ROLLUP_AGGS = ("sum", "min", "max")

# r14 optimization: single-value STRING/BYTES columns flow reader -> writer
# as Arrow arrays (dictionary take / var-byte chunk slices on the read side,
# the writer's Arrow encode chain on the write side) with zero per-value
# Python objects. Tests flip this off to prove byte-identity with the
# historical list path.
_ARROW_TEXT = True

# 32-bit-offset string/binary arrays cap one combined column at 2 GiB of
# payload; columns whose merged Arrow pieces would exceed this fall back
# to the any-size list path (r15, ADVICE r14). Module-level so tests can
# shrink it to exercise the fallback without allocating gigabytes.
_ARROW_TEXT_MAX_BYTES = (1 << 31) - (1 << 20)


def _text_arrow_ok(reader: SegmentReader, name: str) -> bool:
    """Cheap metadata-only gate for the Arrow text fast path (r15, ADVICE
    r14: callers check this across ALL members BEFORE doing any Arrow
    decode, so one nullable member no longer wastes the full decode of
    every earlier member)."""
    if not _ARROW_TEXT:
        return False
    m = reader.metadata.get_column(name)
    return (
        m.is_single_value
        and not m.has_null_values
        and m.data_type in (DataType.STRING, DataType.BYTES)
    )


def _text_arrow(reader: SegmentReader, name: str, selection=None):
    """Arrow payload for a single-value null-free STRING/BYTES column, or
    None when the fast path does not apply (flag off, MV, nullable, other
    types). Nullable columns stay on read_column: the writer re-encodes
    the forward index's *fill* values (null_mask carries the truth), but
    read_columns_arrow applies the null-vector as Arrow validity and
    would lose them."""
    if not _text_arrow_ok(reader, name):
        return None
    return reader.read_columns_arrow([name], selection=selection).column(0)


def merge_segments(
    member_dirs: list[str],
    segment_dir: str | Path,
    segment_name: str,
    table_name: str,
    rollup: "tuple[list[str], dict[str, str]] | None" = None,
    keep_latest: "tuple[list[str], str, tuple] | None" = None,
) -> Path:
    """Merge the member v3 segments (in the given order) into one segment
    at ``segment_dir``; returns the new v3 path. Raises if the members'
    schemas (column set, types, SV/MV) disagree. RAW STRING/BYTES columns
    re-compress with the sink's default codec (LZ4 length-prefixed); the
    original per-chunk codec is not part of the logical schema.

    ``rollup=(dims, metrics)`` additionally collapses rows sharing the
    ``dims`` values, aggregating each metric column by its named function
    (sum/min/max). Every column must then be a dim or a metric, and
    neither may be multi-value or nullable (Pinot's merge-rollup has the
    same shape: dimensions + aggregated metrics)."""
    readers = [SegmentReader.open(d) for d in member_dirs]
    base_cols = readers[0].column_names()
    for r in readers[1:]:
        if r.column_names() != base_cols:
            raise UnsupportedFeatureError(
                f"cannot merge segments with different columns: "
                f"{base_cols} vs {r.column_names()}"
            )

    cols: dict[str, dict] = {}
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
        values = None
        if rollup is None and keep_latest is None:
            # plain concat merge: text columns ride through as Arrow
            # chunks (one per member), re-encoded with no Python values;
            # rollup/keep_latest need pandas frames so they keep the
            # list path.
            # metadata gate first (r15, ADVICE r14): only when EVERY
            # member is eligible do the Arrow decodes run — a nullable
            # late member used to discard the full decode of every
            # earlier one
            if all(_text_arrow_ok(r, name) for r in readers):
                import pyarrow as pa

                chunks = [_text_arrow(r, name) for r in readers]
                pieces = [piece for col in chunks for piece in col.chunks]
                # r15 (ADVICE r14): past the 32-bit offset cap the
                # writer's combine_chunks() would raise ArrowInvalid —
                # fall back to the list path (any size). The size is only
                # knowable after decode, so this rare path pays a double
                # read; correctness over speed at the overflow boundary.
                if sum(p.nbytes for p in pieces) < _ARROW_TEXT_MAX_BYTES:
                    values = pa.chunked_array(pieces)
        if values is None:
            parts = [r.read_column(name) for r in readers]
            if mv:
                values = [row for part in parts for row in part]
            elif isinstance(parts[0], np.ndarray):
                values = np.concatenate(parts)
            else:
                values = [v for part in parts for v in part]
        has_nulls = any(m.has_null_values for m in metas)
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
        partition_config = None
        if metas[0].partition_function is not None and all(
            m.partition_function == metas[0].partition_function
            and m.num_partitions == metas[0].num_partitions
            for m in metas
        ):
            partition_config = (
                metas[0].partition_function,
                metas[0].num_partitions,
            )
        cols[name] = {
            "dt": dt,
            "raw": raw,
            "mv": mv,
            "values": values,
            "null_mask": null_mask,
            # Index configuration is a union: if ANY member carried the
            # index the merged segment keeps it (a fleet rollout
            # mid-stream must not silently drop indexes), constrained to
            # where it is valid.
            "inverted": any(m.has_inverted_index for m in metas)
            and not raw
            and not mv,
            "bloom": any(m.has_bloom_filter for m in metas) and not mv,
            "text_index": any(m.has_text_index for m in metas)
            and not mv
            and dt is DataType.STRING,
            "json_index": any(m.has_json_index for m in metas)
            and not mv
            and dt is DataType.STRING,
            "range_index": any(m.has_range_index for m in metas)
            and not mv
            and dt
            in (
                DataType.INT,
                DataType.LONG,
                DataType.TIMESTAMP,
                DataType.FLOAT,
                DataType.DOUBLE,
            ),
            "partition_config": partition_config,
        }

    if rollup is not None and keep_latest is not None:
        raise UnsupportedFeatureError(
            "rollup and keep_latest are mutually exclusive"
        )
    if rollup is not None:
        _apply_rollup(cols, *rollup)
    if keep_latest is not None:
        _apply_keep_latest(cols, *keep_latest)

    specs = []
    for name in base_cols:
        if rollup is not None and name not in cols:
            continue  # unreachable today; guards future column drops
        c = cols[name]
        compression = (
            LZ4_LENGTH_PREFIXED
            if c["raw"] and c["dt"] in (DataType.STRING, DataType.BYTES)
            else PASS_THROUGH
        )
        specs.append(
            ColumnSpec(
                name,
                c["dt"],
                c["values"],
                raw=c["raw"],
                compression=compression,
                multi_value=c["mv"],
                null_mask=c["null_mask"],
                inverted=c["inverted"],
                bloom=c["bloom"],
                text_index=c["text_index"],
                range_index=c["range_index"],
                json_index=c["json_index"],
                partition_config=c["partition_config"],
            )
        )
    return write_segment(segment_dir, segment_name, table_name, specs)


def _apply_rollup(
    cols: dict, dims: list[str], metrics: dict[str, str]
) -> None:
    """Collapse rows sharing ``dims`` values; aggregate ``metrics`` in
    place. Output rows come out sorted by the dims (pandas groupby sort),
    so a leading dim regains the writer's isSorted flag for free."""
    import pandas as pd

    declared = set(dims) | set(metrics)
    if declared != set(cols):
        raise UnsupportedFeatureError(
            "rollup requires every column to be a dim or a metric; "
            f"unaccounted: {sorted(set(cols) ^ declared)}"
        )
    for name, fn in metrics.items():
        if fn not in _ROLLUP_AGGS:
            raise UnsupportedFeatureError(
                f"rollup metric '{name}': unsupported agg '{fn}'"
            )
        if cols[name]["dt"] not in (
            DataType.INT,
            DataType.LONG,
            DataType.FLOAT,
            DataType.DOUBLE,
            DataType.TIMESTAMP,
        ):
            raise UnsupportedFeatureError(
                f"rollup metric '{name}' must be numeric, got "
                f"{cols[name]['dt'].value}"
            )
    for name in cols:
        if cols[name]["mv"] or cols[name]["null_mask"] is not None:
            raise UnsupportedFeatureError(
                f"rollup over multi-value or nullable column '{name}' is "
                "not supported"
            )

    frame = _frame(cols)
    grouped = frame.groupby(list(dims), sort=True, as_index=False).agg(metrics)
    _writeback(cols, grouped)


def _apply_keep_latest(
    cols: dict, key_columns: list[str], compare_column: str, tiebreakers=()
) -> None:
    """Physical upsert cleanup (the compaction side of Pinot's upsert
    tables): within the merged rows, keep only the newest record per
    primary key — newest = max ``compare_column``, ties broken by the
    ``tiebreakers`` in order. Superseded versions disappear from disk;
    the query-time last-wins window (catalog.load_upsert_table) stays
    correct before, during, and after because last-wins is idempotent —
    per-group cleanup removes bounded garbage, full-table compaction
    converges to exactly one row per key. Output sorted by the key
    columns, so a leading key regains isSorted."""
    for name in (*key_columns, compare_column, *tiebreakers):
        if name not in cols:
            raise UnsupportedFeatureError(
                f"keep_latest column '{name}' not in segment"
            )
    for name in cols:
        if cols[name]["mv"] or cols[name]["null_mask"] is not None:
            raise UnsupportedFeatureError(
                f"keep_latest over multi-value or nullable column "
                f"'{name}' is not supported"
            )
    frame = _frame(cols)
    order = [compare_column, *tiebreakers]
    frame = (
        frame.sort_values(order, ascending=False, kind="mergesort")
        .drop_duplicates(subset=list(key_columns), keep="first")
        .sort_values(list(key_columns), kind="mergesort")
    )
    _writeback(cols, frame)


def _frame(cols: dict):
    import pandas as pd

    return pd.DataFrame(
        {
            name: (
                c["values"]
                if isinstance(c["values"], list)
                else np.asarray(c["values"])
            )
            for name, c in cols.items()
        }
    )


def _writeback(cols: dict, frame) -> None:
    for name in cols:
        out = frame[name].to_numpy()
        if cols[name]["dt"] is DataType.STRING:
            cols[name]["values"] = [str(v) for v in out]
        elif cols[name]["dt"] is DataType.BYTES:
            cols[name]["values"] = list(out)
        else:
            cols[name]["values"] = out


def filter_segment(
    member_dir: str,
    segment_dir: str | Path,
    segment_name: str,
    table_name: str,
    keep_mask: np.ndarray,
) -> Path:
    """Rewrite ONE segment keeping only the rows where ``keep_mask`` is
    True — the storage kernel of row-level deletion (GDPR erasure /
    predicate delete). Preserves each column's physical configuration the
    same way :func:`merge_segments` does (RAW vs dictionary, multi-value,
    nullability, index set, partition map); sortedness is re-detected by
    the writer and a sorted segment stays sorted (filtering preserves
    order). Spark-free, like everything in this module — orchestration
    (zone-map triage, fan-out, commit) lives in maintenance.delete_rows.
    """
    reader = SegmentReader.open(member_dir)
    n = reader.total_docs()
    keep_mask = np.asarray(keep_mask, dtype=bool)
    if keep_mask.shape != (n,):
        raise ValueError(
            f"keep_mask length {keep_mask.shape} != total_docs {n}"
        )
    if not keep_mask.any():
        raise ValueError(
            "filter_segment keeps zero rows — drop the whole segment "
            "instead of writing an empty one"
        )
    idx = np.flatnonzero(keep_mask)

    specs = []
    for name in reader.column_names():
        m = reader.metadata.get_column(name)
        dt = m.data_type
        raw = not m.has_dictionary
        mv = not m.is_single_value
        # selective Arrow decode: RAW text chunks holding no kept doc never
        # decompress, dict text takes ids straight into the writer
        values = _text_arrow(reader, name, selection=idx)
        if values is None:
            values = reader.read_column(name)
            if mv:
                values = [values[i] for i in idx]
            elif isinstance(values, np.ndarray):
                values = values[keep_mask]
            else:
                values = [values[i] for i in idx]
        null_mask = None
        if m.has_null_values:
            nm = reader.null_mask(name)
            if nm is not None:
                nm = nm[keep_mask]
                null_mask = nm if nm.any() else None
        partition_config = (
            (m.partition_function, m.num_partitions)
            if m.partition_function is not None
            else None
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
                inverted=m.has_inverted_index and not raw and not mv,
                bloom=m.has_bloom_filter and not mv,
                text_index=m.has_text_index
                and not mv
                and dt is DataType.STRING,
                range_index=m.has_range_index
                and not mv
                and dt
                in (
                    DataType.INT,
                    DataType.LONG,
                    DataType.TIMESTAMP,
                    DataType.FLOAT,
                    DataType.DOUBLE,
                ),
                json_index=m.has_json_index
                and not mv
                and dt is DataType.STRING,
                partition_config=partition_config,
            )
        )
    return write_segment(segment_dir, segment_name, table_name, specs)


_INDEX_KINDS = ("inverted", "bloom", "range", "text", "json")


def reindex_segment(
    member_dir: str,
    segment_dir: str | Path,
    segment_name: str,
    table_name: str,
    column: str,
    index: str = "inverted",
) -> Path:
    """Rewrite ONE segment with ``index`` ADDED on ``column`` — the
    storage kernel of Pinot's reload-with-new-index-config lifecycle
    (table config gains an index, minions rebuild segments; the data is
    bit-identical, only the index set changes). All other columns keep
    their physical configuration; the target column keeps its encoding
    and gains the requested index where valid (same validity matrix as
    :func:`merge_segments`' index union).

    Spark-free; orchestration (which segments, fan-out, commit) lives in
    maintenance.reindex_table."""
    if index not in _INDEX_KINDS:
        raise ValueError(f"unknown index kind: {index!r}")
    reader = SegmentReader.open(member_dir)
    if reader.metadata.get_column(column) is None:
        raise ValueError(f"column not in segment: {column}")

    specs = []
    for name in reader.column_names():
        m = reader.metadata.get_column(name)
        dt = m.data_type
        raw = not m.has_dictionary
        mv = not m.is_single_value
        values = _text_arrow(reader, name)
        if values is None:
            values = reader.read_column(name)
        null_mask = (
            reader.null_mask(name) if m.has_null_values else None
        )
        add = name == column
        inverted = (m.has_inverted_index or (add and index == "inverted"))
        bloom = m.has_bloom_filter or (add and index == "bloom")
        text_index = m.has_text_index or (add and index == "text")
        range_index = m.has_range_index or (add and index == "range")
        json_index = m.has_json_index or (add and index == "json")
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
                inverted=inverted and not raw and not mv,
                bloom=bloom and not mv,
                text_index=text_index and not mv and dt is DataType.STRING,
                range_index=range_index
                and not mv
                and dt
                in (
                    DataType.INT,
                    DataType.LONG,
                    DataType.TIMESTAMP,
                    DataType.FLOAT,
                    DataType.DOUBLE,
                ),
                json_index=json_index
                and not mv
                and dt is DataType.STRING,
                partition_config=(
                    (m.partition_function, m.num_partitions)
                    if m.partition_function is not None
                    else None
                ),
            )
        )
    return write_segment(segment_dir, segment_name, table_name, specs)
