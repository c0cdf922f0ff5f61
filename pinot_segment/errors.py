"""Error taxonomy, mirroring the reference's error enum
(reference: pinot-segment/src/error.rs)."""


class PinotSegmentError(Exception):
    """Base class for all pinot_segment errors."""


class ParseError(PinotSegmentError):
    """Malformed metadata.properties / index_map content."""


class InvalidFormatError(PinotSegmentError):
    """Binary data violates the segment format (bad magic, overflow...)."""


class UnsupportedFeatureError(PinotSegmentError):
    """Feature outside the supported envelope (e.g. BYTES dictionary)."""


class ColumnNotFoundError(PinotSegmentError):
    """Requested column absent from segment metadata."""
