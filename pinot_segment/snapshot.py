"""Snapshot-versioned segment lists: consistent reads during maintenance.

The problem at fleet scale: ``compact_table`` / ``delete_rows`` commit by
renaming replacement segments in and REMOVING the replaced ones — so a
long-running query that planned against the old segment list dies mid-scan
when its input directories vanish (the classic lakehouse read-write race;
Pinot brokers solve it with routing-table epochs, Iceberg with snapshot
isolation). The reference engine is read-only and never faces this
(reference README.md:418 — writes are roadmap); this module is the
rebuild's answer, Iceberg-style and deliberately tiny:

- ``snapshots.json`` in the table dir is an append-only log of segment
  NAME lists, one entry per committed mutation (sink commit, compaction,
  delete, stream batch). Written atomically (tmp + rename, same protocol
  as the stats manifest) so readers never see a torn log.
- Maintenance ops called with ``retain_replaced=True`` RETIRE replaced
  segments into ``{table}/retired/`` instead of deleting them. Retired
  segments are invisible to every directory walk (the walks probe
  ``{table}/{entry}/v3``; retired segments sit two levels deep) but stay
  byte-addressable for older snapshots.
- ``spark.read.format("pinot").option("as_of", N)`` resolves the segment
  list from snapshot ``N`` — live or retired — giving a repeatable,
  maintenance-immune read of the table as of that commit.
- ``vacuum`` deletes retired segments no snapshot in the keep window
  references, and prunes the log — the storage-reclaim step, decoupled
  from the logical delete exactly so readers get a grace window.

Scale shape: the log holds segment NAMES only — O(segments) bytes, one
small JSON read at plan time (same order as the stats manifest the
planner already reads); no per-row or per-query cost anywhere.

Concurrency contract (same stance as the stats manifest): the log write
is atomic (rename), so readers always see a VALID log, but two
committers appending simultaneously race read-modify-write — the loser's
intermediate entry may be skipped. That is harmless for the isolation
guarantee: the surviving entry records the post-both-commits live set
(each committer walks the directory AFTER its segments landed), so every
recorded snapshot is a real, consistent table state; only an
intermediate version number may never exist. A fleet deployment would
put the log behind the metastore's conditional-put instead of a
filesystem rename — the file layout and reader are unchanged by that
swap.
"""

from __future__ import annotations

import json
import os
import shutil
from datetime import datetime, timezone
from typing import Optional

SNAPSHOT_FILE = "snapshots.json"
RETIRED_DIR = "retired"
VERSION = 1


def _live_segment_names(table_dir: str) -> list[str]:
    """Committed segment dir names (entries with a v3 child), skipping the
    staging dir and the retired store — the same visibility rule as the
    reader's directory walk."""
    names = []
    for entry in sorted(os.listdir(table_dir)):
        if entry in ("tmp", RETIRED_DIR):
            continue
        if os.path.isdir(os.path.join(table_dir, entry, "v3")):
            names.append(entry)
    return names


def load_snapshot_log(table_dir: str) -> Optional[dict]:
    p = os.path.join(table_dir, SNAPSHOT_FILE)
    try:
        with open(p, encoding="utf-8") as f:
            log = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
    if log.get("version") != VERSION:
        return None
    return log


def _write_log(table_dir: str, log: dict) -> None:
    tmp = os.path.join(table_dir, SNAPSHOT_FILE + ".tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(log, f)
    os.replace(tmp, os.path.join(table_dir, SNAPSHOT_FILE))


def append_snapshot(table_dir: str, op: str = "commit") -> int:
    """Record the CURRENT live segment set as the next snapshot; returns
    its id. No-ops (returning the current id) when the set is unchanged,
    so an idempotent re-commit doesn't inflate the log."""
    log = load_snapshot_log(table_dir) or {"version": VERSION, "snapshots": []}
    segs = _live_segment_names(table_dir)
    snaps = log["snapshots"]
    if snaps and snaps[-1]["segments"] == segs:
        return snaps[-1]["id"]
    sid = (snaps[-1]["id"] + 1) if snaps else 1
    snaps.append(
        {
            "id": sid,
            "op": op,
            "segments": segs,
            "ts": datetime.now(timezone.utc).isoformat(),
        }
    )
    _write_log(table_dir, log)
    return sid


def current_snapshot_id(table_dir: str) -> Optional[int]:
    log = load_snapshot_log(table_dir)
    if not log or not log["snapshots"]:
        return None
    return log["snapshots"][-1]["id"]


def _log_entry(table_dir: str, snapshot_id: int) -> dict:
    log = load_snapshot_log(table_dir)
    if log is None:
        raise FileNotFoundError(
            f"No snapshot log in {table_dir} (table predates snapshots "
            "or was never written through the pinot sink)"
        )
    entry = next(
        (s for s in log["snapshots"] if s["id"] == snapshot_id), None
    )
    if entry is None:
        known = [s["id"] for s in log["snapshots"]]
        raise ValueError(
            f"Unknown snapshot id {snapshot_id}; log has {known}"
        )
    return entry


def resolve_segment_dirs(
    table_dir: str, names: list[str], context: str
) -> list[str]:
    """v3 dirs for segment ``names`` — live ones from the table dir,
    replaced ones from ``retired/``. Raises if any was vacuumed away."""
    out = []
    missing = []
    for name in names:
        live = os.path.join(table_dir, name, "v3")
        retired = os.path.join(table_dir, RETIRED_DIR, name, "v3")
        if os.path.isdir(live):
            out.append(live)
        elif os.path.isdir(retired):
            out.append(retired)
        else:
            missing.append(name)
    if missing:
        # Three distinct causes share this symptom (r10 advice): vacuum
        # reclaimed the retired dir; maintenance (compact_table /
        # delete_rows) ran with the default retain_replaced=False, which
        # silently invalidates older snapshots and running CDC streams; or
        # mode('overwrite') deleted the segments outright.
        raise FileNotFoundError(
            f"{context} references segments no longer on disk: {missing}. "
            "Likely causes: vacuum reclaimed them (raise vacuum keep_last), "
            "or compact_table/delete_rows ran with the default "
            "retain_replaced=False (pass retain_replaced=True to keep older "
            "snapshots and CDC feeds readable), or mode('overwrite') removed "
            "them. Recovery: read a newer snapshot / restart the stream "
            "from a live snapshot id."
        )
    return out


def snapshot_segment_names(table_dir: str, snapshot_id: int) -> list[str]:
    """Segment NAMES recorded in snapshot ``snapshot_id`` — no directory
    resolution, so members that were later compacted/vacuumed away don't
    raise (the append-only stream's offset arithmetic only needs the name
    set; resolution happens for the NEW names it actually reads)."""
    return list(_log_entry(table_dir, snapshot_id)["segments"])


def segments_as_of(table_dir: str, snapshot_id: int) -> list[str]:
    """v3 dirs of the segments in snapshot ``snapshot_id`` — live ones
    from the table dir, replaced ones from ``retired/``. Raises if the
    snapshot is unknown or any member was vacuumed away."""
    entry = _log_entry(table_dir, snapshot_id)
    return resolve_segment_dirs(
        table_dir, entry["segments"], f"Snapshot {snapshot_id}"
    )


def changed_segments(
    table_dir: str, from_id: int, to_id: Optional[int] = None
) -> dict:
    """Segment-level diff between two snapshots — the planning step of an
    incremental (CDC-style) read: ``added`` are segments present in
    ``to_id`` but not ``from_id``, ``removed`` the reverse. ``to_id``
    defaults to the latest snapshot. Names only (O(changed) bytes from
    the same one-file log the as_of reader uses); a downstream refresh
    then scans ONLY these segments' bytes instead of diffing two full
    table views — at 100 TB that is the difference between reading the
    delta and reading the table twice."""
    if to_id is None:
        to_id = current_snapshot_id(table_dir)
        if to_id is None:
            raise FileNotFoundError(f"No snapshot log in {table_dir}")
    # id 0 is the virtual pre-history snapshot (empty table): diffing from
    # it emits the whole `to_id` view as additions — how a CDC consumer
    # bootstraps a downstream materialization from scratch.
    old = (
        set()
        if from_id == 0
        else set(_log_entry(table_dir, from_id)["segments"])
    )
    new = (
        set()
        if to_id == 0
        else set(_log_entry(table_dir, to_id)["segments"])
    )
    return {
        "added": sorted(new - old),
        "removed": sorted(old - new),
        "from_id": from_id,
        "to_id": to_id,
    }


def retire_segment(table_dir: str, name: str) -> None:
    """Move a replaced segment into the retired store (atomic rename)
    instead of deleting it, keeping it addressable for older snapshots."""
    dst_parent = os.path.join(table_dir, RETIRED_DIR)
    os.makedirs(dst_parent, exist_ok=True)
    os.replace(
        os.path.join(table_dir, name), os.path.join(dst_parent, name)
    )


def vacuum(table_dir: str, keep_last: int = 1, dry_run: bool = False) -> dict:
    """Delete retired segments referenced by none of the last
    ``keep_last`` snapshots, and prune the log to that window. Live
    segments are never touched. Returns {"removed": [...],
    "kept_snapshots": [...], "pruned_snapshots": [...], "dry_run": bool}.

    ``dry_run=True`` (r11) reports exactly what a real run would remove
    and which snapshot ids it would prune — WITHOUT touching disk or the
    log. Vacuum is the one irreversible operation in the maintenance
    surface (it invalidates older ``as_of`` reads and any stream —
    append-only OR CDC — checkpointed before the kept window; both
    readers fail fast with a documented recovery contract rather than
    guessing), so operators preview it: the ``pruned_snapshots`` list is
    precisely the set of checkpoint ids a running stream must NOT hold
    for the reclaim to be safe."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    log = load_snapshot_log(table_dir)
    retired_parent = os.path.join(table_dir, RETIRED_DIR)
    if log is None or not log["snapshots"]:
        return {
            "removed": [],
            "kept_snapshots": [],
            "pruned_snapshots": [],
            "dry_run": dry_run,
        }
    kept = log["snapshots"][-keep_last:]
    pruned = [s["id"] for s in log["snapshots"][:-keep_last]]
    referenced = {name for s in kept for name in s["segments"]}
    removed = []
    if os.path.isdir(retired_parent):
        for entry in sorted(os.listdir(retired_parent)):
            if entry not in referenced:
                if not dry_run:
                    shutil.rmtree(
                        os.path.join(retired_parent, entry),
                        ignore_errors=True,
                    )
                removed.append(entry)
        if not dry_run:
            try:
                if not os.listdir(retired_parent):
                    os.rmdir(retired_parent)
            except OSError:
                pass
    if not dry_run:
        log["snapshots"] = kept
        _write_log(table_dir, log)
    return {
        "removed": removed,
        "kept_snapshots": [s["id"] for s in kept],
        "pruned_snapshots": pruned,
        "dry_run": dry_run,
    }
