"""Per-column text-match index: token -> doc-bitmap postings.

Pinot ships a text index ("text_index" type in its index_map; Lucene- or
native-FST-backed) so TEXT_MATCH predicates can answer "which docs contain
this token" without scanning values. The reference engine reads no indexes
at all (README.md:311-315 lists index support as out of scope), so this is
a beyond-parity feature of this rebuild — and the storage-side complement
to the LLM-pipeline text operators: a 100 TB corpus stored as segments can
serve keyword probes (quality audits, contamination spot checks, targeted
curation pulls) from the postings instead of decoding every document.

On-disk layout (defined by this rebuild, addressed by Pinot's real
``{column}.text_index`` index_map naming convention):

    magic(8) | n_terms u32 BE | bitmap_bytes u32 BE | terms_size u32 BE
    | terms blob (per term: u16 BE length + UTF-8 bytes, sorted order)
    | per-term 1-bit big-endian doc bitmaps, concatenated in term order

Bit order matches every other 1-bit structure in the format
(fixed_bit.py). The tokenizer is the analyzer contract of the index:
lowercase, maximal ``[a-z0-9]+`` runs — deterministic and exactly
reproducible query-side (including by a SQL oracle via
``regexp_split_to_array(lower(x), '[^a-z0-9]+')``).
"""

from __future__ import annotations

import re
from bisect import bisect_left

import numpy as np

from pinot_segment.errors import InvalidFormatError

_MAGIC = bytes.fromhex("deadbeefdeafbead")

_TOKEN_RE = re.compile(r"[a-z0-9]+")

# A vocabulary larger than this would usually outweigh the column itself;
# mirror the inverted index's refuse-rather-than-bloat stance.
MAX_TERMS = 1 << 20


def tokenize(value: str) -> list[str]:
    """The index analyzer: lowercase, maximal alphanumeric runs."""
    return _TOKEN_RE.findall(value.lower())


def build_text_index(values, null_mask=None) -> bytes:
    """Build the postings blob over per-doc string values. Null docs (per
    ``null_mask``) contribute no tokens — a masked fill value is not data."""
    return build_postings(
        (
            () if (null_mask is not None and null_mask[doc]) else tokenize(v)
            for doc, v in enumerate(values)
        ),
        len(values),
    )


def build_postings(terms_per_doc, n: int) -> bytes:
    """Generic term -> doc-bitmap postings blob (the layout in this module's
    docstring); also the physical format of the JSON index (json_index.py),
    whose terms are flattened ``path=value`` keys instead of tokens."""
    postings: dict[str, list[int]] = {}
    for doc, doc_terms in enumerate(terms_per_doc):
        for term in set(doc_terms):
            postings.setdefault(term, []).append(doc)
    terms = sorted(postings)
    if len(terms) > MAX_TERMS:
        raise ValueError(
            f"text index vocabulary {len(terms)} exceeds cap {MAX_TERMS}"
        )
    terms_blob = bytearray()
    for t in terms:
        b = t.encode("utf-8")
        if len(b) > 0xFFFF:
            raise ValueError(f"text-index term longer than 65535 bytes: {t[:40]}…")
        terms_blob += len(b).to_bytes(2, "big") + b
    bitmap_bytes = (n + 7) // 8
    out = bytearray(_MAGIC)
    out += len(terms).to_bytes(4, "big")
    out += bitmap_bytes.to_bytes(4, "big")
    out += len(terms_blob).to_bytes(4, "big")
    out += terms_blob
    for t in terms:
        bits = np.zeros(n, dtype=np.uint8)
        bits[postings[t]] = 1
        out += np.packbits(bits).tobytes()
    return bytes(out)


class TextIndex:
    """Parsed postings for one column of one segment."""

    def __init__(self, blob: bytes, total_docs: int) -> None:
        if blob[:8] != _MAGIC:
            raise InvalidFormatError("Bad text-index magic")
        self.total_docs = total_docs
        n_terms = int.from_bytes(blob[8:12], "big")
        self.bitmap_bytes = int.from_bytes(blob[12:16], "big")
        terms_size = int.from_bytes(blob[16:20], "big")
        terms_blob = blob[20 : 20 + terms_size]
        self.terms: list[str] = []
        i = 0
        for _ in range(n_terms):
            ln = int.from_bytes(terms_blob[i : i + 2], "big")
            self.terms.append(terms_blob[i + 2 : i + 2 + ln].decode("utf-8"))
            i += 2 + ln
        if i != terms_size:
            raise InvalidFormatError("text-index terms blob size mismatch")
        self._bitmaps = blob[20 + terms_size :]
        expected = n_terms * self.bitmap_bytes
        if len(self._bitmaps) != expected:
            raise InvalidFormatError(
                f"text-index postings size {len(self._bitmaps)} != {expected}"
            )

    def term_mask(self, term: str) -> np.ndarray:
        """Per-doc boolean mask for one term (all-False when absent)."""
        i = bisect_left(self.terms, term)
        if i >= len(self.terms) or self.terms[i] != term:
            return np.zeros(self.total_docs, dtype=bool)
        start = i * self.bitmap_bytes
        bits = np.unpackbits(
            np.frombuffer(self._bitmaps[start : start + self.bitmap_bytes], np.uint8)
        )
        return bits[: self.total_docs].astype(bool)

    def match_mask(self, terms, require_all: bool = True) -> np.ndarray:
        """AND (default) or OR of the per-term masks."""
        masks = (self.term_mask(t) for t in terms)
        out = None
        for m in masks:
            out = m if out is None else (out & m if require_all else out | m)
        if out is None:
            raise ValueError("text match needs at least one term")
        return out
