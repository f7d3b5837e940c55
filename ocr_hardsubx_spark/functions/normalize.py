"""Byte-level text normalization (recognition stage, R1/R2).

Web analog of the reference's OCR projection (``/root/reference/
text_recognition.c:49-55``): accepted regions are projected to normalized
text.  Rules are explicit and byte-stable (no locale, no casefold, no NFC),
so the extracted text is reproducible across environments — the
byte-identical-per-url invariant from BASELINE.json is defined on this
function's output.

Pinned rules (order matters):
  1. CR handling: ``\r\n`` and lone ``\r`` become ``\n``.
  2. NBSP (U+00A0) becomes a plain space.
  3. Each line: runs of spaces/tabs collapse to one space; leading/trailing
     whitespace stripped.
  4. Empty lines are dropped; surviving lines join with a single ``\n``.
     (This is the double_enter collapse from the HardsubX dedup spec.)
  5. A region whose normalized text is empty is dropped entirely
     (empty-or-whitespace rule).
"""

from __future__ import annotations

import re

_CR_RE = re.compile(r"\r\n?")
_WS_RE = re.compile(r"[ \t\f\v\xa0]+")


def normalize_text(raw: str) -> str:
    """Normalize one region's raw text stream to its canonical bytes."""
    s = _CR_RE.sub("\n", raw)
    lines = []
    for line in s.split("\n"):
        line = _WS_RE.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)
