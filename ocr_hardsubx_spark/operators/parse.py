"""HTML -> DOM region tree with incrementally accumulated features.

Web analog of the reference's linear-time component-tree extraction
(``/root/reference/erfilter.c:364-683`` er_tree_extract) with the
per-pixel / per-merge incremental descriptor updates
(``erfilter.c:686-736`` er_add_pixel, ``erfilter.c:739-797`` er_merge):

  pixels            -> text characters
  grey threshold    -> DOM containment depth
  extremal region   -> element node (one Region per element)
  area              -> text chars in subtree
  perimeter         -> 2 * subtree element count (tag boundaries)
  euler (holes)     -> count of embedded non-text islands (script/img/...)
  crossings per row -> inline-tag starts per text line
  med_crossings     -> median of crossings at lines h/6, 3h/6, 5h/6
                       (reference erfilter.c:799-808)
  raw/central moments -> start/end offsets in the document text stream

All features are accumulated bottom-up in one pass: a child's stats fold
into its parent exactly once when the child's end tag closes (the er_merge
pattern), so extraction is O(bytes) per document and runs entirely inside
one Arrow batch — no Spark shuffle is involved (SURVEY.md §2.3 D5).
"""

from __future__ import annotations

from html.parser import HTMLParser

from ..config import (
    BLOCK_TAGS,
    INLINE_TAGS,
    ISLAND_TAGS,
    SKIP_CONTENT_TAGS,
    VOID_TAGS,
)


class Region:
    """One DOM element = one extremal-region analog (reference ERStat,
    erfilter.c:40-75)."""

    __slots__ = (
        "region_id", "parent_id", "depth", "tag",
        "start", "end", "raw_start", "raw_end",
        "area", "link_area", "skipped_chars",
        "n_elements", "islands", "start_line", "end_line",
        "ev_start", "ev_end", "child_profiles",
        # filled by the cascade:
        "crossings", "med_crossings", "hole_area_ratio",
        "convex_hull_ratio", "num_inflexion_points",
        "probability", "local_maxima", "group_id",
    )

    def __init__(self, region_id: int, parent_id: int, depth: int, tag: str,
                 start: int, raw_start: int, start_line: int,
                 ev_start: int) -> None:
        self.region_id = region_id
        self.parent_id = parent_id
        self.depth = depth
        self.tag = tag
        self.start = start
        self.end = start
        self.raw_start = raw_start
        self.raw_end = raw_start
        self.area = 0
        self.link_area = 0
        self.skipped_chars = 0
        self.n_elements = 1
        self.islands = 0
        self.start_line = start_line
        self.end_line = start_line
        self.ev_start = ev_start
        self.ev_end = ev_start
        self.child_profiles: list[float] = []
        self.crossings = None
        self.med_crossings = 0.0
        self.hole_area_ratio = 0.0
        self.convex_hull_ratio = 1.0
        self.num_inflexion_points = 0.0
        self.probability = 0.0
        self.local_maxima = False
        self.group_id = -1

    @property
    def n_lines(self) -> int:
        return self.end_line - self.start_line + 1

    @property
    def span(self) -> int:
        """chars of visible text covered in the stream (== area by construction)."""
        return self.end - self.start

    @property
    def raw_span(self) -> int:
        """bbox analog: raw chars covered incl. skipped island content."""
        return self.raw_end - self.raw_start

    @property
    def link_density(self) -> float:
        return self.link_area / max(1, self.area)


class _TreeBuilder(HTMLParser):
    """Single-pass SAX walk emitting Regions; tolerant of malformed nesting
    (unmatched end tags are ignored; missing end tags implicitly close)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.regions: list[Region] = []
        self.stack: list[Region] = []
        self.chunks: list[str] = []      # document-order text stream
        self.text_off = 0                # visible chars emitted so far (NB: not
        # "offset"/"lineno" — those names are used internally by ParserBase)
        self.raw_off = 0              # visible + skipped chars
        self.line_no = 0                 # newlines emitted so far
        self.inline_events: list[int] = []   # line_no per inline-tag start
        self.skip_depth = 0              # >0 while inside SKIP_CONTENT_TAGS
        self._in_link = 0                # >0 while inside <a>
        self._next_id = 0
        # root pseudo-region = whole document (component-tree root,
        # reference: root component = whole image)
        self._open("#document")

    # -- region lifecycle ---------------------------------------------------
    def _open(self, tag: str) -> Region:
        parent = self.stack[-1] if self.stack else None
        r = Region(
            self._next_id,
            parent.region_id if parent is not None else -1,
            len(self.stack),
            tag,
            self.text_off,
            self.raw_off,
            self.line_no,
            len(self.inline_events),
        )
        self._next_id += 1
        self.regions.append(r)
        self.stack.append(r)
        if tag == "a":
            self._in_link += 1
        return r

    def _close(self) -> None:
        r = self.stack.pop()
        if r.tag == "a":
            self._in_link -= 1
        r.end = self.text_off
        r.raw_end = self.raw_off
        r.end_line = self.line_no
        r.ev_end = len(self.inline_events)
        if self.stack:
            p = self.stack[-1]
            # er_merge analog: fold child stats into parent (erfilter.c:746-779)
            p.area += r.area
            p.link_area += r.link_area
            p.skipped_chars += r.skipped_chars
            p.n_elements += r.n_elements
            p.islands += r.islands
            # per-child content profile (1 - link_density) drives the
            # num_inflexion_points analog (SURVEY.md §2.4 C2)
            if r.area > 0:
                p.child_profiles.append(1.0 - r.link_area / r.area)

    def _emit_text(self, s: str) -> None:
        if not s:
            return
        self.chunks.append(s)
        n = len(s)
        self.text_off += n
        self.raw_off += n
        self.line_no += s.count("\n")
        cur = self.stack[-1]
        cur.area += n
        if self._in_link:
            cur.link_area += n

    # -- HTMLParser callbacks -------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in VOID_TAGS:
            self.handle_startendtag(tag, attrs)
            return
        if tag in SKIP_CONTENT_TAGS:
            self.skip_depth += 1
        if tag in ISLAND_TAGS:
            self.stack[-1].islands += 1
        if tag in INLINE_TAGS and self.skip_depth == 0:
            self.inline_events.append(self.line_no)
        self._open(tag)

    def handle_startendtag(self, tag, attrs):
        cur = self.stack[-1]
        if tag == "br" and self.skip_depth == 0:
            self._emit_text("\n")
        if tag in ISLAND_TAGS:
            cur.islands += 1
        cur.n_elements += 1

    def handle_endtag(self, tag):
        if tag in VOID_TAGS:
            return
        # find matching open tag; ignore stray end tags
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                while len(self.stack) > i:
                    top = self.stack[-1]
                    if top.tag in BLOCK_TAGS and self.skip_depth == 0:
                        if self.text_off > top.start:  # only if it held text
                            self._emit_text("\n")
                    if top.tag in SKIP_CONTENT_TAGS:
                        self.skip_depth -= 1
                    self._close()
                return

    def handle_data(self, data):
        if self.skip_depth:
            self.stack[-1].skipped_chars += len(data)
            self.raw_off += len(data)
        else:
            self._emit_text(data)

    def finish(self) -> None:
        while self.stack:
            top = self.stack[-1]
            if top.tag in SKIP_CONTENT_TAGS:
                self.skip_depth -= 1
            self._close()


def parse_document(html: bytes | str) -> tuple[list[Region], str, list[int]]:
    """Parse one page; return (regions in preorder, document text stream,
    inline-tag line events).

    regions[0] is the #document root.  Offsets (start/end) index into the
    returned stream; region subtree text == stream[r.start : r.end].
    """
    if isinstance(html, bytes):
        html = html.decode("utf-8", errors="replace")
    tb = _TreeBuilder()
    tb.feed(html)
    tb.finish()
    return tb.regions, "".join(tb.chunks), tb.inline_events


def region_crossings(r: Region, inline_events: list[int]) -> list[int]:
    """Per-line inline-tag start counts for a region (crossings analog)."""
    counts = [0] * r.n_lines
    for ln in inline_events[r.ev_start:r.ev_end]:
        idx = ln - r.start_line
        if 0 <= idx < len(counts):
            counts[idx] += 1
    return counts


def med_crossings(counts: list[int]) -> float:
    """Median of crossings sampled at lines h/6, 3h/6, 5h/6
    (reference erfilter.c:799-808)."""
    h = len(counts)
    if h == 0:
        return 0.0
    sample = sorted((counts[h // 6], counts[3 * h // 6], counts[5 * h // 6]))
    return float(sample[1])
