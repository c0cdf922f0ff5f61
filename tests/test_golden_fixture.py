"""Golden-segment tests over COMMITTED bytes (tests/fixtures/).

The reference validates its reader against a real Pinot quickstart segment
with known constants (reference pinot-segment/tests/integration_tests.rs:
16-23, 39-44: 97,889 docs; ``hits`` cardinality 250, 8 bits, values 0..=262).
This repo has no Docker/quickstart, so the committed golden segment mirrors
those constants exactly (tools/make_golden_fixture.py), and these tests run
the same assertions — against bytes checked into git, NOT freshly-written
ones, breaking the writer↔reader self-consistency loop:

- the reader tier decodes committed bytes and compares to an independent
  seeded-numpy reconstruction of the data (no writer in the loop);
- the writer tier regenerates the segment and diffs byte-for-byte against
  the committed files (writer output is frozen);
- a sha256 literal pins the committed bytes themselves (even a coordinated
  generator+writer change must update the hash explicitly).
"""

import hashlib
import os

import pytest

from pinot_segment import SegmentMetadata, SegmentReader

from tools.make_golden_fixture import (
    FIXTURE_DIR,
    HITS_CARDINALITY,
    HITS_MAX,
    SEGMENT_NAME,
    TOTAL_DOCS,
    golden_columns,
)

V3 = os.path.join(FIXTURE_DIR, SEGMENT_NAME, "v3")

# Frozen at fixture-generation time. If this test fails after a writer
# change, the on-disk format changed: regenerate with
# tools/make_golden_fixture.py ONLY if the change is intentional, and say so
# in the commit message.
COLUMNS_PSF_SHA256 = "099e1935366eaa253d55e36d53cb8b0a1d48e6f644fc23a0188f64e3f1dfe30b"


def test_golden_fixture_is_committed():
    for f in ("metadata.properties", "index_map", "columns.psf"):
        assert os.path.isfile(os.path.join(V3, f)), f"missing committed {f}"
    digest = hashlib.sha256(
        open(os.path.join(V3, "columns.psf"), "rb").read()
    ).hexdigest()
    assert digest == COLUMNS_PSF_SHA256


def test_golden_metadata_reference_constants():
    """integration_tests.rs:16-23 assertions, against committed bytes."""
    md = SegmentMetadata.from_file(os.path.join(V3, "metadata.properties"))
    assert md.total_docs == TOTAL_DOCS == 97_889
    hits = md.columns["hits"]
    assert hits.cardinality == HITS_CARDINALITY == 250
    assert hits.bits_per_element == 8
    assert hits.has_dictionary


def test_golden_decode_matches_independent_reconstruction():
    """Decode committed bytes; compare to the seeded-numpy data (the writer
    is NOT in this loop — the expected values come from the generator's
    data-construction step only)."""
    expected = {spec.name: spec.values for spec in golden_columns()}
    reader = SegmentReader.open(V3)
    got = reader.read_columns_arrow(list(expected)).to_pydict()
    for name, vals in expected.items():
        assert got[name] == vals, f"column {name} decode mismatch"
    # integration_tests.rs:42-48 value-range assertion
    assert all(0 <= v <= HITS_MAX for v in got["hits"])


def test_writer_reproduces_golden_bytes(tmp_path):
    """Current writer output must be byte-identical to the committed fixture
    — writer byte drift cannot silently co-evolve with the reader."""
    from pinot_segment.writer import write_segment

    v3 = write_segment(tmp_path / "regen", SEGMENT_NAME, "golden", golden_columns())
    for f in ("metadata.properties", "index_map", "columns.psf"):
        fresh = (v3 / f).read_bytes()
        committed = open(os.path.join(V3, f), "rb").read()
        assert fresh == committed, f"{f}: writer output drifted from committed bytes"
