"""HTML → main-text extraction with boilerplate removal.

The first stage of a web-corpus pipeline (C4 / RefinedWeb lineage):
strip markup, drop script/style/head machinery, segment into
block-level text blocks, and keep the content blocks while dropping
navigation/footer boilerplate by the classic block heuristics —
link density (fraction of a block's characters inside ``<a>``) and
minimum block length.  Pure stdlib ``html.parser`` inside an
Arrow-batched ``mapInPandas`` (the documented exception to the
expression-only rule: markup parsing is not SQL-expressible), one
output batch per input batch, partition-preserving — at 100 TB the
extraction is map-side-only work on whatever partitioning the raw
crawl already has.

Reference parity: none — the reference engine reads SQL tables only;
this is north-star LLM-pipeline surface (SURVEY.md §2.8), documented
like the multimodal decode stages.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

EXTRACT_SCHEMA_FIELDS = [
    T.StructField("text", T.StringType()),
    T.StructField("n_blocks_kept", T.IntegerType()),
    T.StructField("n_blocks_dropped", T.IntegerType()),
    T.StructField("title", T.StringType()),
]

# block-level elements end the current text block
_BLOCK_TAGS = {
    "p", "div", "li", "ul", "ol", "table", "tr", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "br", "hr", "article",
    "section", "header", "footer", "nav", "aside", "blockquote",
    "pre", "figure", "figcaption", "main", "form",
}
# subtrees whose text is never content
_SKIP_TAGS = {"script", "style", "noscript", "template", "head", "svg"}
# block contexts that are boilerplate regardless of density
_BOILERPLATE_CONTEXT = {"nav", "footer", "aside"}


def _make_extractor(min_block_chars: int, max_link_density: float):
    """Extractor closure (pickles by value — executors don't import
    this package): html → (text, kept, dropped, title)."""
    from html.parser import HTMLParser as _HTMLParser

    block_tags, skip_tags, boiler = (
        _BLOCK_TAGS,
        _SKIP_TAGS,
        _BOILERPLATE_CONTEXT,
    )

    class _Extractor(_HTMLParser):
        def __init__(self):
            super().__init__(convert_charrefs=True)
            self.blocks: list[tuple[str, int, bool]] = []
            self.buf: list[str] = []
            self.link_chars = 0
            self.skip_depth = 0
            self.svg_depth = 0
            self.link_depth = 0
            self.boiler_depth = 0
            self.in_title = False
            self.title_buf: list[str] = []

        def _flush(self):
            text = " ".join("".join(self.buf).split())
            if text:
                self.blocks.append(
                    (text, self.link_chars, self.boiler_depth > 0)
                )
            self.buf, self.link_chars = [], 0
            # browsers auto-close <a> at block boundaries; html.parser
            # doesn't, so an unclosed <a> would otherwise mark every
            # later block as 100% link text and drop the whole page
            self.link_depth = 0

        def handle_starttag(self, tag, attrs):
            if tag in skip_tags:
                self.skip_depth += 1
                if tag == "svg":
                    self.svg_depth += 1
            elif tag == "title" and not self.svg_depth:
                # the document title lives in <head> (a skip tag), so
                # it can't gate on skip_depth — but <title> inside
                # <svg> is icon label text, not the document title
                self.in_title = True
            elif tag == "a":
                self.link_depth += 1
            if tag in block_tags:
                self._flush()
                if tag in boiler:
                    self.boiler_depth += 1

        def handle_endtag(self, tag):
            if tag in skip_tags:
                self.skip_depth = max(0, self.skip_depth - 1)
                if tag == "svg":
                    self.svg_depth = max(0, self.svg_depth - 1)
            elif tag == "title":
                self.in_title = False
            elif tag == "a":
                self.link_depth = max(0, self.link_depth - 1)
            if tag in block_tags:
                self._flush()
                if tag in boiler:
                    self.boiler_depth = max(0, self.boiler_depth - 1)

        def handle_data(self, data):
            if self.in_title:  # before the skip guard: title lives in head
                self.title_buf.append(data)
                return
            if self.skip_depth:
                return
            self.buf.append(data)
            if self.link_depth:
                self.link_chars += len(data)

    def extract(raw: str):
        try:
            p = _Extractor()
            p.feed(raw)
            p.close()
            p._flush()
        except Exception:
            return None, None, None, None
        kept, dropped = [], 0
        for text, link_chars, in_boiler in p.blocks:
            density = link_chars / len(text) if text else 1.0
            if (
                in_boiler
                or len(text) < min_block_chars
                or density > max_link_density
            ):
                dropped += 1
                continue
            kept.append(text)
        # convert_charrefs=True already decoded entities in handle_data;
        # unescaping again would corrupt literal "&amp;" in source text
        title = " ".join("".join(p.title_buf).split()) or None
        return "\n\n".join(kept), len(kept), dropped, title

    return extract


def extract_html_text(
    df: DataFrame,
    html_col: str,
    id_col: str = "doc_id",
    min_block_chars: int = 40,
    max_link_density: float = 0.33,
) -> DataFrame:
    """``(id, html)`` → ``(id, text, n_blocks_kept, n_blocks_dropped,
    title)``: markup stripped, ``script``/``style``/``head`` subtrees
    dropped, block segmentation on block-level tags, and a block kept
    only when it is outside ``nav``/``footer``/``aside``, at least
    ``min_block_chars`` long, and at most ``max_link_density`` of its
    characters sit inside links — the jusText/C4-style heuristic pair
    that separates prose from chrome.  Unparseable rows yield NULL text
    (decline, don't fabricate)."""

    id_field = df.schema[id_col]
    out_schema = T.StructType(
        [T.StructField(id_col, id_field.dataType)] + EXTRACT_SCHEMA_FIELDS
    )

    def make_fn(min_chars: int, max_density: float):
        extract = _make_extractor(min_chars, max_density)

        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                texts, kept, dropped, titles = [], [], [], []
                for raw in pdf[html_col]:
                    t, k, d, ti = extract(raw if raw is not None else "")
                    texts.append(t)
                    kept.append(k)
                    dropped.append(d)
                    titles.append(ti)
                yield pd.DataFrame(
                    {
                        id_col: pdf[id_col],
                        "text": texts,
                        "n_blocks_kept": kept,
                        "n_blocks_dropped": dropped,
                        "title": titles,
                    }
                )

        return fn

    return df.select(id_col, html_col).mapInPandas(
        make_fn(min_block_chars, max_link_density), out_schema
    )
