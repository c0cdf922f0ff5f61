"""Parser for a Pinot segment's ``index_map`` file.

Behavioral spec: reference pinot-segment/src/index_map.rs:18-92. Lines are
``{column}.{index_type}.{property}={value}`` with property in
{startOffset, size}; column names may themselves contain dots, so keys are
split right-to-left (index_map.rs:36-57). Only the ``dictionary`` and
``forward_index`` index types are consumed downstream.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

from pinot_segment.errors import ParseError


@dataclass
class IndexLocation:
    """Byte range of one index inside columns.psf (index_map.rs:6-10)."""

    start_offset: int = 0
    size: int = 0


class IndexMap:
    """Maps (column, index_type) -> IndexLocation."""

    def __init__(self, indexes: dict[tuple[str, str], IndexLocation]) -> None:
        self.indexes = indexes

    @classmethod
    def from_file(cls, path: str | Path) -> "IndexMap":
        return cls.parse(Path(path).read_text(encoding="utf-8"))

    @classmethod
    def parse(cls, content: str) -> "IndexMap":
        indexes: dict[tuple[str, str], IndexLocation] = {}
        for raw in content.splitlines():
            line = raw.strip()
            if not line or line.startswith("#"):
                continue
            eq = line.find("=")
            if eq < 0:
                continue
            key_part = line[:eq].strip()
            value = line[eq + 1 :].strip()

            parts = key_part.split(".")
            if len(parts) < 3:
                continue  # malformed entry — skipped, as the reference does
            prop = parts[-1]
            index_type = parts[-2]
            column = ".".join(parts[:-2])

            try:
                num = int(value)
            except ValueError as e:
                raise ParseError(f"Invalid number '{value}': {e}") from None

            loc = indexes.setdefault((column, index_type), IndexLocation())
            if prop == "startOffset":
                loc.start_offset = num
            elif prop == "size":
                loc.size = num
            # unknown properties ignored
        return cls(indexes)

    def get_index(self, column: str, index_type: str) -> IndexLocation | None:
        return self.indexes.get((column, index_type))

    def get_dictionary(self, column: str) -> IndexLocation | None:
        return self.get_index(column, "dictionary")

    def get_forward_index(self, column: str) -> IndexLocation | None:
        return self.get_index(column, "forward_index")
