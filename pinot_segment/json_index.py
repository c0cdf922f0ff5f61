"""Per-column JSON index: flattened ``path=value`` keys -> doc bitmaps.

Pinot's ``json_index`` type accelerates JSON_MATCH predicates over JSON
string columns by flattening every record's scalar paths at ingest and
indexing them; the reference engine reads no indexes (README.md:311-315),
so this is a beyond-parity feature of this rebuild — and the natural
partner of the `json_extract_events` query surface: payload columns at
100 TB (event properties, API logs) serve `$.path = value` probes from
postings instead of parsing JSON per row per query.

Physical layout: identical to the text index (text_index.py — magic,
sorted term dictionary, per-term 1-bit doc bitmaps), addressed by Pinot's
real ``{column}.json_index`` index_map naming convention. Only the term
generator differs: terms are the flattened scalar paths of the parsed
document.

Flattening contract (the probe side must canonicalize identically):

- scalars at nested object paths: ``{"a": {"b": 1}}`` -> ``$.a.b=1``
- array elements (scalars): ``{"t": ["x","y"]}`` -> ``$.t[*]=x``,
  ``$.t[*]=y`` (Pinot-style any-element match; positions not indexed)
- objects inside arrays flatten through the same ``[*]`` step
- value canonicalization: strings verbatim; ints via ``str``; floats via
  ``repr`` (so 87 and 87.0 differ, as they do in JSON); booleans as
  ``true``/``false``; JSON null is NOT indexed (SQL-null semantics —
  a missing and a null path are equally unmatchable)
- unparseable values contribute no keys (a malformed row can never
  match a JSON_MATCH probe, same as Pinot)
"""

from __future__ import annotations

import json

from pinot_segment.text_index import TextIndex, build_postings

MAX_KEYS_PER_DOC = 4096  # a pathological document cannot explode the index


def canonical_value(v) -> str | None:
    """Canonical string for a JSON scalar; None for null (not indexed)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    return str(v)


def flatten_json(text: str) -> list[str]:
    """``path=value`` keys for every scalar in the document; [] when the
    text is not valid JSON or not an object/array."""
    try:
        root = json.loads(text)
    except (ValueError, TypeError):
        return []
    out: list[str] = []

    def walk(node, path: str) -> None:
        if len(out) > MAX_KEYS_PER_DOC:
            raise ValueError(
                f"JSON document flattens to more than {MAX_KEYS_PER_DOC} keys"
            )
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{path}.{k}")
        elif isinstance(node, list):
            for v in node:
                walk(v, f"{path}[*]")
        else:
            cv = canonical_value(node)
            if cv is not None:
                out.append(f"{path}={cv}")

    if not isinstance(root, (dict, list)):
        return []
    walk(root, "$")
    return out


def build_json_index(values, null_mask=None) -> bytes:
    return build_postings(
        (
            ()
            if (null_mask is not None and null_mask[doc])
            else flatten_json(v)
            for doc, v in enumerate(values)
        ),
        len(values),
    )


class JsonIndex(TextIndex):
    """Parsed ``path=value`` postings — same physical format as TextIndex,
    probed with exact keys instead of analyzer tokens."""

    def path_value_mask(self, path: str, value: str):
        return self.term_mask(f"{path}={value}")
