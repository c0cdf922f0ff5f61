"""Generate the committed golden v3 segment fixture (tests/fixtures/).

Deterministic (seeded numpy) — running this script twice produces identical
bytes. The fixture mirrors the reference's real-segment integration constants
(reference pinot-segment/tests/integration_tests.rs:16-23: 97,889 docs, an
INT ``hits`` column with cardinality 250, 8 bits per element, values in
0..=262) so the metadata assertions of that test run against committed bytes
here, with no Pinot quickstart/Docker dependency.

The byte-frozen output breaks the writer↔reader self-consistency loop: the
reader test decodes COMMITTED bytes (not freshly-written ones), and a writer
test regenerates the segment and diffs against the committed bytes — either
side drifting alone fails.

Usage: PYTHONPATH=/root/repo python tools/make_golden_fixture.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

from pinot_segment.metadata import DataType
from pinot_segment.var_byte import LZ4_LENGTH_PREFIXED
from pinot_segment.writer import ColumnSpec, write_segment

TOTAL_DOCS = 97_889  # integration_tests.rs:39
HITS_CARDINALITY = 250  # integration_tests.rs:21
HITS_MAX = 262  # integration_tests.rs:44 (values 0..=262)
SEED = 20260813

FIXTURE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "fixtures",
    "golden_OFFLINE",
)
SEGMENT_NAME = "golden_OFFLINE_0"


def golden_columns() -> list[ColumnSpec]:
    """The exact column data of the golden segment (seeded, deterministic)."""
    rng = np.random.default_rng(SEED)
    # hits: exactly 250 distinct values drawn from 0..=262, 8-bit packed
    domain = np.sort(rng.choice(HITS_MAX + 1, size=HITS_CARDINALITY, replace=False))
    hits = domain[rng.integers(0, HITS_CARDINALITY, size=TOTAL_DOCS)]
    # playerID: low-card dict STRING (includes one NUL-containing value to
    # pin the writer's exact dict-id path)
    players = [f"player_{i:03d}" for i in range(40)] + ["nul\x00ly"]
    player = [players[i] for i in rng.integers(0, len(players), size=TOTAL_DOCS)]
    # yearID: LONG dict
    year = (1871 + rng.integers(0, 143, size=TOTAL_DOCS)).astype(np.int64)
    # avg: DOUBLE dict (quantized to keep cardinality bounded)
    avg = np.round(rng.integers(0, 1000, size=TOTAL_DOCS) / 1000.0, 3)
    # bio: RAW STRING, LZ4-length-prefixed var-byte chunks
    bio = [f"row {i} of the golden segment ({hits[i]} hits)" for i in range(TOTAL_DOCS)]
    return [
        ColumnSpec("hits", DataType.INT, [int(v) for v in hits]),
        ColumnSpec("playerID", DataType.STRING, player),
        ColumnSpec("yearID", DataType.LONG, [int(v) for v in year]),
        ColumnSpec("avg", DataType.DOUBLE, [float(v) for v in avg]),
        ColumnSpec(
            "bio", DataType.STRING, bio, raw=True, compression=LZ4_LENGTH_PREFIXED
        ),
    ]


def write_golden(out_dir):
    """Write the golden segment with the LZ4 encoder PINNED to pyarrow's
    lz4_raw — the encoder that produced the committed bytes. Without the pin,
    lz4_block.compress() prefers the C `lz4` wheel when installed, which
    emits different (equally valid) blocks for the raw `bio` column and
    breaks the byte-exact freeze on such environments."""
    from pinot_segment import lz4_block

    prev = lz4_block.force_encoder("pyarrow")
    try:
        return write_segment(out_dir, SEGMENT_NAME, "golden", golden_columns())
    finally:
        lz4_block.force_encoder(prev)


def main() -> None:
    out = os.path.join(FIXTURE_DIR, SEGMENT_NAME)
    v3 = write_golden(out)
    for f in ("metadata.properties", "index_map", "columns.psf"):
        p = os.path.join(v3, f)
        print(f"{os.path.getsize(p):>10}  {p}")


if __name__ == "__main__":
    sys.exit(main())
