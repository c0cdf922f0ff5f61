"""Index-map parser tests — vectors ported from reference index_map.rs:95-141."""

from pinot_segment.index_map import IndexMap

CONTENT = """
# Index map for segment
hits.dictionary.startOffset=1024
hits.dictionary.size=40
hits.forward_index.startOffset=1064
hits.forward_index.size=48986
playerID.forward_index.startOffset=50050
playerID.forward_index.size=5000000
"""


def test_parse_index_map():
    im = IndexMap.parse(CONTENT)

    d = im.get_dictionary("hits")
    assert d.start_offset == 1024 and d.size == 40

    f = im.get_forward_index("hits")
    assert f.start_offset == 1064 and f.size == 48986

    # RAW column has no dictionary entry.
    assert im.get_dictionary("playerID") is None
    assert im.get_forward_index("playerID").start_offset == 50050


def test_column_name_with_dots():
    # Right-to-left key split (index_map.rs:129-140).
    content = """
some.column.name.dictionary.startOffset=100
some.column.name.dictionary.size=200
"""
    im = IndexMap.parse(content)
    d = im.get_dictionary("some.column.name")
    assert d.start_offset == 100 and d.size == 200


def test_malformed_lines_skipped():
    im = IndexMap.parse("short=1\nno_equals_line\nc.t.startOffset=7\n")
    assert im.get_index("c", "t").start_offset == 7
    assert len(im.indexes) == 1
