"""X12 segmenting: raw text -> list of segments.

X12 wire format (public ANSI ASC X12 envelope conventions, as used by
the reference's corpus — see /root/reference/testdata/README.md:153-158):
segments terminated by ``~``, elements separated by ``*``, components
by ``:``. Element positions are indexed AFTER the segment ID is
stripped, i.e. ``elements[0]`` is ISA01.
"""

from __future__ import annotations

from dataclasses import dataclass, field

SEGMENT_TERMINATOR = "~"
ELEMENT_SEPARATOR = "*"
COMPONENT_SEPARATOR = ":"


@dataclass
class Segment:
    segment_id: str
    elements: list[str] = field(default_factory=list)
    raw: str = ""

    def el(self, i: int, default: str = "") -> str:
        """Bounds-guarded element access (reference behavior: missing
        or out-of-range positional elements read as empty string,
        silver_x12_parsing.py:221-237)."""
        if 0 <= i < len(self.elements):
            return self.elements[i]
        return default

    def num(self, i: int) -> float:
        """Numeric element with the reference's empty-string guard:
        ``float(x) if x else 0.0`` (silver_x12_parsing.py:231)."""
        v = self.el(i).strip()
        if not v:
            return 0.0
        try:
            return float(v)
        except ValueError:
            return 0.0


def split_segments(text: str) -> list[Segment]:
    """Split raw X12 text into structured segments.

    Handles both one-line (``~``-joined) and newline-separated files;
    empty fragments are dropped.
    """
    out: list[Segment] = []
    for frag in text.replace("\r", "").replace("\n", "").split(SEGMENT_TERMINATOR):
        frag = frag.strip()
        if not frag:
            continue
        parts = frag.split(ELEMENT_SEPARATOR)
        out.append(Segment(segment_id=parts[0].strip(), elements=parts[1:], raw=frag))
    return out
