"""Boilerplate removal: main-content extraction from page HTML.

The webtext-pipeline stage between "extracted text" and "training
document": strip navigation / link lists / chrome, keep the prose. The
classifier is the classic block-level link-density heuristic (jusText,
Kohlschütter et al.'s boilerpipe): split the DOM into blocks at
block-level tags, drop blocks whose text is mostly anchor text or too
short to be prose.

Fits the Ray side as a stateless actor-pool stage
(:class:`MainContentStage`): the parser is constructed once per actor,
each batch is one vectorized pandas pass over the html column. No
reference counterpart (Zeno archives pages; it never de-boilerplates) —
this is a driver-brief training-data extension.
"""

from __future__ import annotations

from html.parser import HTMLParser

import numpy as np
import pandas as pd

BLOCK_TAGS = frozenset({
    "p", "h1", "h2", "h3", "h4", "h5", "h6", "li", "div", "td", "th",
    "pre", "blockquote", "article", "section", "header", "footer", "nav",
    "ul", "ol", "table", "tr", "body",
})

_SKIP_SUBTREES = frozenset({"script", "style", "noscript", "template",
                            "title"})


class _BlockCollector(HTMLParser):
    """Collects (block_text, anchor_chars) pairs; a new block starts at
    every open OR close of a block-level tag."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int]] = []
        self._buf: list[str] = []
        self._anchor_chars = 0
        self._anchor_depth = 0
        self._skip_depth = 0

    def _flush(self):
        text = "".join(self._buf)
        if text.strip():
            self.blocks.append((text, self._anchor_chars))
        self._buf = []
        self._anchor_chars = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_SUBTREES:
            self._skip_depth += 1
            return
        if tag == "a":
            self._anchor_depth += 1
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREES:
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._skip_depth:
            return
        self._buf.append(data)
        if self._anchor_depth:
            self._anchor_chars += len(data)

    def close(self):
        super().close()
        self._flush()


def main_content(html: str, max_link_density: float = 0.5,
                 min_chars: int = 2) -> str:
    """Extract the prose blocks of *html*: blocks whose anchor-text
    fraction is below *max_link_density* and whose stripped text has at
    least *min_chars* characters, joined by newlines in document order.
    Deterministic and pure — safe to run anywhere in a pipeline."""
    p = _BlockCollector()
    try:
        p.feed(html)
        p.close()
    except Exception:
        return ""  # malformed beyond html.parser's tolerance: no content
    kept = []
    for text, anchor_chars in p.blocks:
        stripped = text.strip()
        if len(stripped) < min_chars:
            continue
        if anchor_chars / max(len(text), 1) >= max_link_density:
            continue
        kept.append(stripped)
    return "\n".join(kept)


class MainContentStage:
    """Actor-pool stage over the pages table: html (binary|str) →
    ``main_text`` + ``main_chars`` + ``boiler_frac`` (fraction of the
    full extracted text dropped as boilerplate). Use with
    ``map_batches(MainContentStage, batch_format="pandas",
    concurrency=N)``."""

    def __init__(self, max_link_density: float = 0.5, min_chars: int = 2):
        self.max_link_density = max_link_density
        self.min_chars = min_chars

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        mains = []
        for html in batch["html"]:
            if isinstance(html, (bytes, bytearray)):
                html = html.decode("utf-8", "replace")
            mains.append(main_content(html, self.max_link_density,
                                      self.min_chars))
        out = batch.copy()
        out["main_text"] = mains
        out["main_chars"] = np.fromiter(
            (len(m) for m in mains), dtype=np.int64, count=len(mains))
        if "text" in out.columns:
            full = out["text"].str.len().to_numpy(np.int64)
            out["boiler_frac"] = np.round(
                1.0 - out["main_chars"].to_numpy() / np.maximum(full, 1), 6)
        return out
