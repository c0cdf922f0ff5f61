"""Generate the PERMANENTLY-frozen v3 segment fixture (tests/fixtures/).

This is the second golden segment, encoded with the pure-Python LZ4 block
encoder (`lz4_block.compress_py` — stable bytes on any environment, no codec
dependency). Unlike the regenerable golden fixture
(tools/make_golden_fixture.py), this one is NEVER regenerated: there is no
writer-reproduces test for it, its sha256 pins cover all three files, and
this script refuses to overwrite existing output. The point (round-2 review):
a future codec or writer change can legitimately rotate the regenerable
fixture's bytes, but it can never rotate ALL committed fixtures at once —
this one keeps decoding yesterday's bytes forever, so reader↔writer
co-evolution past the freeze is detectable.

Same v3 format tier as the reference reader (metadata.properties + index_map
+ columns.psf, reference segment.rs / var_byte.rs:266-316 for the
LZ4_LENGTH_PREFIXED raw chunks this fixture exercises).

Usage: PYTHONPATH=/root/repo python tools/make_frozen_fixture.py
(errors if the fixture already exists — it is frozen).
"""

from __future__ import annotations

import os
import sys

import numpy as np

from pinot_segment import lz4_block
from pinot_segment.metadata import DataType
from pinot_segment.var_byte import LZ4_LENGTH_PREFIXED
from pinot_segment.writer import ColumnSpec, write_segment

TOTAL_DOCS = 12_000
SEED = 20260814

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "frozen_OFFLINE",
)
SEGMENT_NAME = "frozen_OFFLINE_0"


def frozen_columns() -> list[ColumnSpec]:
    """The exact column data of the frozen segment (seeded, deterministic).
    Shapes chosen to exercise every committed-bytes decode path: INT dict,
    STRING dict (with a NUL-containing value), LONG dict, DOUBLE dict,
    BOOLEAN 1-bit dict, and a RAW STRING column in LZ4-length-prefixed
    var-byte chunks (the pure-Python-encoded region)."""
    rng = np.random.default_rng(SEED)
    score = rng.integers(0, 500, size=TOTAL_DOCS)
    tags = [f"tag_{i:02d}" for i in range(25)] + ["nul\x00tag"]
    tag = [tags[i] for i in rng.integers(0, len(tags), size=TOTAL_DOCS)]
    ts = (1_700_000_000 + rng.integers(0, 10_000_000, size=TOTAL_DOCS)).astype(
        np.int64
    )
    ratio = np.round(rng.integers(0, 500, size=TOTAL_DOCS) / 500.0, 3)
    flag = rng.integers(0, 2, size=TOTAL_DOCS) == 1
    # Repetitive prose so the LZ4 encoder emits real matches, not just
    # literal runs — the decode path must handle overlapping-match output.
    note = [
        f"note {i}: score={score[i]} score={score[i]} tag={tag[i]} end-{i}"
        for i in range(TOTAL_DOCS)
    ]
    return [
        ColumnSpec("score", DataType.INT, [int(v) for v in score]),
        ColumnSpec("tag", DataType.STRING, tag),
        ColumnSpec("ts", DataType.LONG, [int(v) for v in ts]),
        ColumnSpec("ratio", DataType.DOUBLE, [float(v) for v in ratio]),
        ColumnSpec("flag", DataType.BOOLEAN, [bool(v) for v in flag]),
        ColumnSpec(
            "note", DataType.STRING, note, raw=True, compression=LZ4_LENGTH_PREFIXED
        ),
    ]


def main() -> None:
    out = os.path.join(FIXTURE_DIR, SEGMENT_NAME)
    if os.path.exists(out):
        print(
            f"refusing: {out} exists — this fixture is permanently frozen; "
            "delete it manually only if you intend to break the freeze "
            "(and say so in the commit message)",
            file=sys.stderr,
        )
        return 1
    prev = lz4_block.force_encoder("python")
    try:
        v3 = write_segment(out, SEGMENT_NAME, "frozen", frozen_columns())
    finally:
        lz4_block.force_encoder(prev)
    for f in ("metadata.properties", "index_map", "columns.psf"):
        p = os.path.join(v3, f)
        print(f"{os.path.getsize(p):>10}  {p}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
