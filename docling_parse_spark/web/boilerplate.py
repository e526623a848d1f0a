"""DOM boilerplate stripping via text-density / link-density heuristics.

The reference has no HTML path (SURVEY.md §2.F); this branch implements the
north rule's "HTML boilerplate strip, DOM heuristics" from the published
Boilerpipe (Kohlschütter et al., WSDM 2010) and jusText (Pomikálek 2011)
block-classification ideas:

1. segment the DOM into text blocks at block-level element boundaries;
2. score each block: character count, word count, link density
   (chars inside <a> / total chars), tag density (tags / words);
3. classify: a block is main content when it has enough words, low link
   density, and does not sit inside structural boilerplate containers
   (nav/header/footer/aside) or machine regions (script/style/form).
   Short heading blocks are kept when a content block follows them.

Emits ordered ``(kind, text, media_ref)`` spans: one ``text`` span per
content block, one ``media`` span per <img> inside content, in DOM order.
Pure Python (stdlib html.parser) — runs batched inside ``mapInPandas``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th",
    "article", "section", "main", "blockquote", "pre", "figcaption",
    "caption", "dd", "dt", "summary", "title",
}
BOILERPLATE_CONTAINERS = {"nav", "header", "footer", "aside", "form", "menu"}
SKIP_CONTENT = {"script", "style", "noscript", "template", "svg", "iframe"}
HEADING_TAGS = {"h1", "h2", "h3", "h4", "h5", "h6", "title"}

MIN_WORDS = 5
MAX_LINK_DENSITY = 0.33
_WS = re.compile(r"\s+")


@dataclass
class Block:
    tag: str = "p"
    text_parts: list = field(default_factory=list)
    anchor_chars: int = 0
    total_chars: int = 0
    in_boilerplate: bool = False
    images: list = field(default_factory=list)  # (position_in_block, src)

    @property
    def text(self) -> str:
        return _WS.sub(" ", "".join(self.text_parts)).strip()

    @property
    def link_density(self) -> float:
        return self.anchor_chars / self.total_chars if self.total_chars else 0.0

    @property
    def n_words(self) -> int:
        return len(self.text.split())

    def is_heading(self) -> bool:
        return self.tag in HEADING_TAGS


class _BlockParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._current: Block | None = None
        self._anchor_depth = 0
        self._boiler_depth = 0
        self._skip_depth = 0

    def _flush(self):
        if self._current is not None and (self._current.text or self._current.images):
            self.blocks.append(self._current)
        self._current = None

    def _ensure(self, tag: str = "p"):
        if self._current is None:
            self._current = Block(tag=tag, in_boilerplate=self._boiler_depth > 0)
        return self._current

    def handle_starttag(self, tag, attrs):
        if tag in SKIP_CONTENT:
            self._skip_depth += 1
            return
        if tag in BOILERPLATE_CONTAINERS:
            self._flush()
            self._boiler_depth += 1
        if tag in BLOCK_TAGS:
            self._flush()
            self._ensure(tag)
        if tag == "a":
            self._anchor_depth += 1
        if tag == "br":
            b = self._current
            if b is not None:
                b.text_parts.append(" ")
        if tag == "img":
            src = dict(attrs).get("src")
            if src and self._skip_depth == 0:
                b = self._ensure()
                b.images.append((len(b.text_parts), src))

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if tag in SKIP_CONTENT:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in BOILERPLATE_CONTAINERS:
            self._flush()
            self._boiler_depth = max(0, self._boiler_depth - 1)
        if tag in BLOCK_TAGS:
            self._flush()
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)

    def handle_data(self, data):
        if self._skip_depth > 0:
            return
        if not data.strip():
            # a whitespace-only text node between inline elements
            # ("<i>one</i> <i>two</i>") is still a word separator: append
            # one space to an OPEN block (round-4 review — dropping it
            # merged adjacent words), but never open a block for it and
            # never count it toward char/link densities
            if self._current is not None and self._current.text_parts:
                self._current.text_parts.append(" ")
            return
        b = self._ensure()
        b.text_parts.append(data)
        n = len(data.strip())
        b.total_chars += n
        if self._anchor_depth > 0:
            b.anchor_chars += n

    def close(self):
        super().close()
        self._flush()


def segment_blocks(html: str) -> list[Block]:
    p = _BlockParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        p._flush()
    return p.blocks


def classify_blocks(blocks: list[Block]) -> list[bool]:
    """Boilerpipe-style density classification; heading lookahead keeps a
    short heading when the next classified block is content."""
    keep = [False] * len(blocks)
    for i, b in enumerate(blocks):
        if b.in_boilerplate:
            continue
        if b.n_words >= MIN_WORDS and b.link_density <= MAX_LINK_DENSITY:
            keep[i] = True
    # heading retention pass (jusText "short" -> "near-good" promotion)
    for i, b in enumerate(blocks):
        if keep[i] or b.in_boilerplate or not b.is_heading() or not b.text:
            continue
        for j in range(i + 1, min(i + 3, len(blocks))):
            if keep[j]:
                keep[i] = b.link_density <= MAX_LINK_DENSITY
                break
    # image retention: an image block below the word threshold (text-less
    # figures AND short-caption figcaption/caption blocks — round-4
    # review: requiring emptiness dropped captioned figures) is content
    # when flanked by a kept block
    for i, b in enumerate(blocks):
        if keep[i] or b.in_boilerplate or not b.images or b.n_words >= MIN_WORDS:
            continue
        prev_kept = any(keep[j] for j in range(max(0, i - 2), i))
        next_kept = any(keep[j] for j in range(i + 1, min(i + 3, len(blocks))))
        keep[i] = prev_kept or next_kept
    return keep


def extract_html_spans(html: str) -> list[tuple[str, str | None, str | None]]:
    """HTML -> ordered (kind, text, media_ref) spans of the main content."""
    blocks = segment_blocks(html)
    keep = classify_blocks(blocks)
    spans: list[tuple[str, str | None, str | None]] = []
    for b, k in zip(blocks, keep):
        if not k:
            continue
        if b.text:
            spans.append(("text", b.text, None))
        for _, src in b.images:
            spans.append(("media", None, src))
    return spans
