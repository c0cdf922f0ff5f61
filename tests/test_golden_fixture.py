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
    — writer byte drift cannot silently co-evolve with the reader. The LZ4
    encoder is pinned (write_golden) to the one that produced the committed
    bytes; without the pin this test would flake on environments where the
    C `lz4` wheel shadows pyarrow's lz4_raw with different valid blocks."""
    from tools.make_golden_fixture import write_golden

    v3 = write_golden(tmp_path / "regen")
    for f in ("metadata.properties", "index_map", "columns.psf"):
        fresh = (v3 / f).read_bytes()
        committed = open(os.path.join(V3, f), "rb").read()
        assert fresh == committed, f"{f}: writer output drifted from committed bytes"


# ---------------------------------------------------------------------------
# Frozen tier: the SECOND golden segment (tools/make_frozen_fixture.py),
# encoded with the pure-Python LZ4 encoder and PERMANENTLY frozen. There is
# deliberately no writer-reproduces test here: the regenerable fixture above
# may rotate with an intentional writer/codec change, but this one never
# does, so the reader must keep decoding yesterday's bytes forever — a
# coordinated reader+writer format drift cannot rotate every fixture at once.
# ---------------------------------------------------------------------------

from tools.make_frozen_fixture import (  # noqa: E402
    FIXTURE_DIR as FROZEN_DIR,
    SEGMENT_NAME as FROZEN_SEGMENT,
    TOTAL_DOCS as FROZEN_DOCS,
    frozen_columns,
)

FROZEN_V3 = os.path.join(FROZEN_DIR, FROZEN_SEGMENT, "v3")

# Frozen forever at generation time (2026-08-13). These literals are never
# updated; a failure here means the committed bytes themselves changed.
FROZEN_SHA256 = {
    "metadata.properties": "2f3994b98e435497eb2c6249bab588c72e23308d532b39f00f20c82ade0e57bb",
    "index_map": "8d47585066fc9e8b9637b5b93430b2585531e9bd6a1e84b7e9477e7109c609b4",
    "columns.psf": "084dd55b7c27ff0664bf91b04d65a440e9eccf6c9cab236be75df514e31524e5",
}


def test_frozen_fixture_bytes_never_change():
    for f, want in FROZEN_SHA256.items():
        path = os.path.join(FROZEN_V3, f)
        assert os.path.isfile(path), f"missing committed {f}"
        digest = hashlib.sha256(open(path, "rb").read()).hexdigest()
        assert digest == want, f"{f}: frozen fixture bytes changed"


def test_frozen_decode_matches_independent_reconstruction():
    """The reader (whatever its current decode paths) must decode the
    permanently-frozen bytes to the generator's seeded data — including the
    pure-Python-encoded LZ4 chunks, the 1-bit BOOLEAN dictionary, and the
    NUL-containing dictionary string."""
    md = SegmentMetadata.from_file(os.path.join(FROZEN_V3, "metadata.properties"))
    assert md.total_docs == FROZEN_DOCS == 12_000
    expected = {spec.name: spec.values for spec in frozen_columns()}
    reader = SegmentReader.open(FROZEN_V3)
    got = reader.read_columns_arrow(list(expected)).to_pydict()
    for name, vals in expected.items():
        assert got[name] == vals, f"column {name} decode mismatch"


def test_frozen_chunks_decode_with_pure_python_lz4():
    """Belt-and-braces: the spec decoder (no pyarrow/wheel) round-trips the
    frozen raw column too, so the committed blocks are decodable even with
    every native codec absent."""
    from pinot_segment import SegmentReader, lz4_block
    from pinot_segment.var_byte import VarByteChunkReader

    reader = SegmentReader.open(FROZEN_V3)
    loc = reader.index_map.get_forward_index("note")
    rdr = VarByteChunkReader.read(
        os.path.join(FROZEN_V3, "columns.psf"),
        loc.start_offset,
        loc.size,
        reader.total_docs(),
    )
    lo, hi = rdr._chunk_bounds(0)
    raw = rdr.chunks[lo:hi]
    size = int.from_bytes(raw[:4], "little")
    body = lz4_block.decompress(raw[4:])  # size hint withheld -> Python loop
    assert len(body) == size
